package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused int8 symmetric quantization of a float/double vector:
  * `struct(q8: array<int>, qscale: double)` with
  * `qscale = 127 / max|v_i|` (0 when the vector is all zeros) and
  * `q_i = floor(v_i · qscale + 0.5)` — values provably in [-127, 127].
  *
  * One kernel instead of two chained HOF projections because the HOF
  * form is quadratic after CollapseProject: the max-abs `aggregate`
  * lambda gets re-inlined into the quantizing `transform` lambda and
  * re-evaluated PER ELEMENT (the repo's documented interpreted-lambda
  * gotcha) — this loop is one pass, allocation-bounded by the output
  * array. Semantics the DuckDB oracle replays verbatim:
  * null vector → null; any null element → null (a null poisons both
  * the max and the element it quantizes; partial quantization would
  * silently mis-scale the non-null elements).
  *
  * CodegenFallback is deliberate, matching the other array-producing
  * kernels ([[TokenHashes]]): the output feeds projection/shuffle
  * boundaries where whole-stage fusion buys little.
  */
case class Q8Quantize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_q8 expects array<float> or array<double>, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("q8", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("qscale", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_q8"

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      val a = math.abs(v)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = if (maxAbs > 0.0) 127.0 / maxAbs else 0.0
    val out = new Array[Int](n)
    i = 0
    while (i < n) {
      val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      out(i) = math.floor(v * scale + 0.5).toInt
      i += 1
    }
    InternalRow(new GenericArrayData(out), scale)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Q8Quantize {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Q8Quantize].getCanonicalName, null, "graft_q8",
    "graft_q8(vec) - struct(q8 array<int>, qscale double): symmetric int8 quantization", "")

  val builder: Seq[Expression] => Expression = {
    case Seq(a) => Q8Quantize(a)
    case args => throw new IllegalArgumentException(
      s"graft_q8 expects 1 argument, got ${args.length}")
  }
}
