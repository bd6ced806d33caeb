package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_hyperplane_keys(vec, planes, planesPerBand)` →
  * `array<bigint>`: one hyperplane-LSH signature key per band.
  *
  * Band b's key sets bit j (0-based within the band) iff
  * `dot(vec, planes[b·planesPerBand + j]) > 0`, with the dot product
  * evaluated in double precision as the same left-to-right fold as
  * [[DotProduct]] — so each key is bit-identical to the composed form
  * `sum_j(CASE WHEN graft_dot(vec, plane_j) > 0 THEN 2^j ELSE 0 END)`
  * that the DuckDB oracles replay. A null vector element or a
  * vec/plane length mismatch makes that dot NULL in the composed form,
  * i.e. the bit stays 0 — mirrored here. Trailing planes that don't
  * fill a whole band are ignored.
  *
  * Why a kernel instead of composing graft_dot per plane: a 32-band ×
  * 4-plane layout composed per-plane puts 128 separate array-literal
  * expression nodes in the plan — seconds of analyzer/optimizer time
  * per query — while this form carries ONE literal plane matrix
  * (evaluated once per expression instance, not per row) and runs the
  * whole signature as a tight JVM loop. CodegenFallback is deliberate:
  * the output feeds an explode boundary, and the eval loop is already
  * allocation-free per plane.
  */
case class HyperplaneKeys(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {

  private def numericElem(dt: DataType): Boolean = dt match {
    case FloatType | DoubleType | IntegerType | LongType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(v, _), ArrayType(ArrayType(p, _), _), IntegerType)
          if numericElem(v) && numericElem(p) =>
        if (!second.foldable)
          TypeCheckResult.TypeCheckFailure(
            "graft_hyperplane_keys expects a literal (foldable) plane matrix")
        else if (!third.foldable)
          TypeCheckResult.TypeCheckFailure(
            "graft_hyperplane_keys expects a literal planesPerBand")
        else third.eval(null) match {
          // bit j is 1L << j: more than 63 planes per band would wrap
          // the shift silently (colliding keys, recall loss), 0 or
          // negative would divide-by-zero in the band count — reject
          // both here so SQL-level callers get a type-check error, not
          // wrong candidates. NULL would unbox to 0 at eval time: same
          // divide-by-zero, so reject it here too.
          case null => TypeCheckResult.TypeCheckFailure(
            "graft_hyperplane_keys expects a non-NULL planesPerBand in 1..63")
          case r: Int if r < 1 || r > 63 => TypeCheckResult.TypeCheckFailure(
            s"graft_hyperplane_keys expects planesPerBand in 1..63, got $r")
          case _ => TypeCheckResult.TypeCheckSuccess
        }
      case (v, p, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_hyperplane_keys expects (array<numeric>, array<array<numeric>>, int), " +
          s"got ${v.sql}, ${p.sql}, ${r.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_keys"

  private def elemGetter(dt: DataType): (ArrayData, Int) => Double = dt match {
    case FloatType   => (a, i) => a.getFloat(i).toDouble
    case DoubleType  => (a, i) => a.getDouble(i)
    case IntegerType => (a, i) => a.getInt(i).toDouble
    case LongType    => (a, i) => a.getLong(i).toDouble
    case other       => throw new IllegalStateException(s"unsupported element type $other")
  }

  /** The literal plane matrix, materialized once per expression
    * instance (checkInputDataTypes guarantees foldability). */
  @transient private lazy val planeMatrix: Array[Array[Double]] = {
    val planesType = second.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[ArrayType].elementType
    val get = elemGetter(planesType)
    val outer = second.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(outer.numElements()) { i =>
      val inner = outer.getArray(i)
      Array.tabulate(inner.numElements())(j => get(inner, j))
    }
  }

  @transient private lazy val planesPerBand: Int =
    third.eval(null).asInstanceOf[Int]

  override def nullSafeEval(vecAny: Any, planesAny: Any, rAny: Any): Any = {
    val vec = vecAny.asInstanceOf[ArrayData]
    val getVec = elemGetter(first.dataType.asInstanceOf[ArrayType].elementType)
    val r = planesPerBand
    val nBands = planeMatrix.length / r
    val dim = vec.numElements()
    // composed-form parity: any null vector element ⇒ every dot NULL ⇒ all bits 0
    var hasNull = false
    var i = 0
    while (i < dim && !hasNull) { hasNull = vec.isNullAt(i); i += 1 }
    val keys = new Array[Any](nBands)
    var b = 0
    while (b < nBands) {
      var key = 0L
      var j = 0
      while (j < r) {
        val plane = planeMatrix(b * r + j)
        if (!hasNull && plane.length == dim) {
          var s = 0.0
          var k = 0
          while (k < dim) { s += getVec(vec, k) * plane(k); k += 1 }
          if (s > 0) key += 1L << j
        }
        j += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object HyperplaneKeys {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[HyperplaneKeys].getCanonicalName, null, "graft_hyperplane_keys",
    "graft_hyperplane_keys(vec, planes, planesPerBand) - per-band hyperplane-LSH sign keys", "")

  val builder: Seq[Expression] => Expression = {
    case Seq(a, b, c) => HyperplaneKeys(a, b, c)
    case args => throw new IllegalArgumentException(
      s"graft_hyperplane_keys expects 3 arguments, got ${args.length}")
  }
}
