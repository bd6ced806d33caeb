package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, QuaternaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_top_cells(vec, cells, centroids, nProbe)` → `array<int>`:
  * the ids of the `nProbe` nearest (max cosine) centroids, ties to
  * the LOWEST cell id — the IVF probe assignment.
  *
  * Bit-identical to the composed literal-struct form
  * `slice(sort_array(array(struct(dot(v,c_j)/(norm(v)·sqrt(dot(c_j,c_j))), -cell_j), ...), desc), 1, nProbe)`
  * that [[graft.operators.KMeans.assignCells]] and
  * [[graft.operators.Similarity.ivfTopKTrained]] build per centroid:
  * the dot products are the same left-to-right double fold as
  * [[DotProduct]], the division the same `dot / (normV · normC)`
  * shape, and the ordering replays Spark's double ordering exactly —
  * `if (x == y) 0 else java.lang.Double.compare(x, y)`, so NaN sorts
  * greatest (a zero vector probes the lowest cell ids) and a NULL
  * cosine (null vector element or vec/centroid length mismatch)
  * sorts last, like a null struct field under descending sort.
  *
  * Why a kernel: k centroids composed as literal structs put k
  * array-literal expression nodes (k·dim literals) in the plan —
  * at k = 64 that is seconds of analyzer/codegen time PER QUERY, and
  * [[graft.operators.KMeans.fit]] rebuilds the plan every Lloyd
  * iteration. This form carries ONE literal centroid matrix,
  * materialized once per expression instance. CodegenFallback is
  * deliberate: the output feeds an explode/groupBy boundary and the
  * eval loop is allocation-free per centroid.
  */
case class TopCells(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with CodegenFallback {

  private def numericElem(dt: DataType): Boolean = dt match {
    case FloatType | DoubleType | IntegerType | LongType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(v, _), ArrayType(IntegerType, _), ArrayType(ArrayType(c, _), _), IntegerType)
          if numericElem(v) && numericElem(c) =>
        if (!second.foldable || !third.foldable)
          TypeCheckResult.TypeCheckFailure(
            "graft_top_cells expects literal (foldable) cell-id and centroid arrays")
        else if (!fourth.foldable)
          TypeCheckResult.TypeCheckFailure("graft_top_cells expects a literal nProbe")
        else (second.eval(null), third.eval(null), fourth.eval(null)) match {
          case (null, _, _) | (_, null, _) => TypeCheckResult.TypeCheckFailure(
            "graft_top_cells expects non-NULL cell-id and centroid arrays")
          case (_, _, null) => TypeCheckResult.TypeCheckFailure(
            "graft_top_cells expects a non-NULL nProbe >= 1")
          case (_, _, p: Int) if p < 1 => TypeCheckResult.TypeCheckFailure(
            s"graft_top_cells expects nProbe >= 1, got $p")
          case (ids: ArrayData, cents: ArrayData, _) if ids.numElements() != cents.numElements() =>
            TypeCheckResult.TypeCheckFailure(
              s"graft_top_cells cell-id/centroid arity mismatch: " +
                s"${ids.numElements()} ids vs ${cents.numElements()} centroids")
          case (ids: ArrayData, _, _) if ids.numElements() == 0 =>
            TypeCheckResult.TypeCheckFailure("graft_top_cells needs at least one centroid")
          case _ => TypeCheckResult.TypeCheckSuccess
        }
      case (v, i, c, p) => TypeCheckResult.TypeCheckFailure(
        s"graft_top_cells expects (array<numeric>, array<int>, array<array<numeric>>, int), " +
          s"got ${v.sql}, ${i.sql}, ${c.sql}, ${p.sql}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_top_cells"

  private def elemGetter(dt: DataType): (ArrayData, Int) => Double = dt match {
    case FloatType   => (a, i) => a.getFloat(i).toDouble
    case DoubleType  => (a, i) => a.getDouble(i)
    case IntegerType => (a, i) => a.getInt(i).toDouble
    case LongType    => (a, i) => a.getLong(i).toDouble
    case other       => throw new IllegalStateException(s"unsupported element type $other")
  }

  @transient private lazy val cellIds: Array[Int] = {
    val arr = second.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(arr.getInt)
  }

  @transient private lazy val centroids: Array[Array[Double]] = {
    val elemType = third.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[ArrayType].elementType
    val get = elemGetter(elemType)
    val outer = third.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(outer.numElements()) { i =>
      val inner = outer.getArray(i)
      Array.tabulate(inner.numElements())(j => get(inner, j))
    }
  }

  /** sqrt(dot(c,c)) per centroid — the value Catalyst constant-folds
    * out of the literal-struct form. */
  @transient private lazy val centroidNorms: Array[Double] =
    centroids.map { c =>
      var s = 0.0
      var k = 0
      while (k < c.length) { s += c(k) * c(k); k += 1 }
      math.sqrt(s)
    }

  @transient private lazy val nProbe: Int = fourth.eval(null).asInstanceOf[Int]

  /** Spark's SQLOrderingUtil double ordering: -0.0 == 0.0, NaN
    * greatest, NaN == NaN. */
  private def cmpDouble(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  override def nullSafeEval(vecAny: Any, idsAny: Any, centsAny: Any, pAny: Any): Any = {
    val vec = vecAny.asInstanceOf[ArrayData]
    val getVec = elemGetter(first.dataType.asInstanceOf[ArrayType].elementType)
    val dim = vec.numElements()
    var hasNull = false
    var i = 0
    while (i < dim && !hasNull) { hasNull = vec.isNullAt(i); i += 1 }
    val k = centroids.length
    // cosines; NaN-boxed as java.lang.Double with null = NULL cosine
    val cos = new Array[java.lang.Double](k)
    if (!hasNull) {
      var vv = 0.0
      var d = 0
      while (d < dim) { val x = getVec(vec, d); vv += x * x; d += 1 }
      val normV = math.sqrt(vv)
      var j = 0
      while (j < k) {
        val c = centroids(j)
        if (c.length == dim) {
          var s = 0.0
          var m = 0
          while (m < dim) { s += getVec(vec, m) * c(m); m += 1 }
          cos(j) = s / (normV * centroidNorms(j))
        }
        j += 1
      }
    }
    // order: cos desc (NaN greatest, NULL last), ties cell asc —
    // exactly sort_array(struct(cos, -cell), desc)
    val order = Array.tabulate(k)(identity)
    val sorted = order.sortWith { (a, b) =>
      val ca = cos(a); val cb = cos(b)
      if (ca == null && cb == null) cellIds(a) < cellIds(b)
      else if (ca == null) false
      else if (cb == null) true
      else {
        val c = cmpDouble(ca, cb)
        if (c != 0) c > 0 else cellIds(a) < cellIds(b)
      }
    }
    val take = math.min(nProbe, k)
    val out = new Array[Any](take)
    var t = 0
    while (t < take) { out(t) = cellIds(sorted(t)); t += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object TopCells {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[TopCells].getCanonicalName, null, "graft_top_cells",
    "graft_top_cells(vec, cells, centroids, nProbe) - nProbe nearest-centroid ids by cosine", "")

  val builder: Seq[Expression] => Expression = {
    case Seq(a, b, c, d) => TopCells(a, b, c, d)
    case args => throw new IllegalArgumentException(
      s"graft_top_cells expects 4 arguments, got ${args.length}")
  }
}
