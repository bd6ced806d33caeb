package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization codec kernels (the [[TopCells]] pattern: all
  * codebook parameters arrive as LITERAL arguments, materialized once
  * per expression instance into flat primitive arrays).
  *
  * Why kernels: the first PQ implementation unrolled the per-cell
  * argmin as a literal expression tree — m × k struct-scored dot
  * products with every centroid inlined as an array literal. At the
  * catalog geometry (4 × 16 cells × 16 dims) that tree generates
  * >64 KB of Java in one method, janino refuses ("Code grows beyond
  * 64 KB"), WholeStageCodegen falls back to INTERPRETED evaluation
  * for the whole stage, and the map-side encode became the measured
  * bottleneck (4.2 s / 20k rows at sf1; 68 s for `sim_topk_pq` at
  * sf10). A single expression with an allocation-free loop over a
  * pre-extracted codebook keeps the plan small regardless of m·k·dim.
  * CodegenFallback is deliberate, exactly as in [[TopCells]]: one
  * virtual call per row into a tight compiled Scala loop.
  *
  * Codebook encoding shared by both kernels:
  *  - `subOffsets` (array<int>, m+1 entries) fences each subspace's
  *    range in the flat cell arrays;
  *  - `cellIds` (array<int>) — cell ids, ascending WITHIN a subspace
  *    (the encode scan uses strict `<`, so ascending order resolves
  *    score ties to the lowest cell id — the same total order as the
  *    array_min-of-structs form it replaces and the DuckDB oracle's
  *    (score ASC, cell ASC) row_number);
  *  - `coords` (array<array<double>>) — centroid coordinates per
  *    global cell index;
  *  - `cc` (array<double>) — precomputed dot(c, c) per global cell
  *    index, in the kernel's left-to-right fold order.
  */
private[functions] trait PqBooksArgs { self: Expression =>
  /** literal args, in order after the data argument */
  protected def subOffsetsArg: Expression
  protected def cellIdsArg: Expression
  protected def coordsArg: Expression

  protected def checkBookArgs(): TypeCheckResult = {
    val ok = (subOffsetsArg.dataType, cellIdsArg.dataType, coordsArg.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _),
            ArrayType(ArrayType(DoubleType, _), _)) => true
      case _ => false
    }
    if (!ok) TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<int> subOffsets, array<int> cellIds, array<array<double>> coords)")
    else if (!subOffsetsArg.foldable || !cellIdsArg.foldable || !coordsArg.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects literal codebook arguments")
    else (subOffsetsArg.eval(null), cellIdsArg.eval(null), coordsArg.eval(null)) match {
      case (null, _, _) | (_, null, _) | (_, _, null) =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName expects non-NULL codebook arguments")
      case (so: ArrayData, ids: ArrayData, co: ArrayData) =>
        if (so.numElements() < 2)
          TypeCheckResult.TypeCheckFailure(s"$prettyName needs at least one subspace")
        else if (ids.numElements() != co.numElements())
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName cellIds/coords arity mismatch: ${ids.numElements()} vs ${co.numElements()}")
        else if (so.getInt(so.numElements() - 1) != ids.numElements())
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName subOffsets must end at cellIds length ${ids.numElements()}")
        else if (so.getInt(0) != 0)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName subOffsets must start at 0, got ${so.getInt(0)}")
        else if ((1 until so.numElements()).exists(i => so.getInt(i) <= so.getInt(i - 1)))
          // An empty subspace range would leave the encode argmin with no
          // candidate (bi = -1 -> cellIds(-1) at EXECUTION time); since the
          // kernels are SQL-exposed, malformed calls must die at analysis.
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName subOffsets must be strictly increasing (no empty subspace)")
        else {
          val inner = (0 until co.numElements()).map(co.getArray)
          if (inner.exists(_ == null))
            TypeCheckResult.TypeCheckFailure(s"$prettyName coords must not contain NULL centroids")
          else if (inner.nonEmpty && inner.exists(_.numElements() != inner.head.numElements()))
            TypeCheckResult.TypeCheckFailure(s"$prettyName coords centroids must share one dimension")
          else TypeCheckResult.TypeCheckSuccess
        }
    }
  }

  /** Arity of the codebook, for sibling-argument checks (cc). */
  protected def bookCellCount: Int =
    cellIdsArg.eval(null).asInstanceOf[ArrayData].numElements()

  @transient protected lazy val subOffsets: Array[Int] = {
    val a = subOffsetsArg.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(a.numElements())(a.getInt)
  }
  @transient protected lazy val m: Int = subOffsets.length - 1
  @transient protected lazy val cellIds: Array[Int] = {
    val a = cellIdsArg.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(a.numElements())(a.getInt)
  }
  @transient private lazy val coordsOuter: ArrayData =
    coordsArg.eval(null).asInstanceOf[ArrayData]
  /** dims per subspace, from the first centroid */
  @transient protected lazy val subDim: Int =
    if (coordsOuter.numElements() == 0) 0 else coordsOuter.getArray(0).numElements()
  /** flat row-major coords, subDim doubles per global cell index */
  @transient protected lazy val coords: Array[Double] = {
    val n = coordsOuter.numElements()
    val flat = new Array[Double](n * subDim)
    var i = 0
    while (i < n) {
      val inner = coordsOuter.getArray(i)
      var j = 0
      while (j < subDim) { flat(i * subDim + j) = inner.getDouble(j); j += 1 }
      i += 1
    }
    flat
  }
}

/** `graft_pq_encode(vec, subOffsets, cellIds, coords, cc)` →
  * `array<int>`: per subspace, the cell id minimizing
  * `cc − 2·dot(v_s, c)` (the shared dot(v,v) cancels in the argmin),
  * ties to the lowest cell id. The sub-dot accumulates left-to-right
  * in double — bit-identical to the unrolled [[DotProduct]] form it
  * replaces, so the DuckDB full-replay oracles hold unchanged. NULL
  * on NULL input, element-count ≠ m·subDim, or a NULL element. */
case class PqEncode(children: Seq[Expression])
    extends Expression with PqBooksArgs with CodegenFallback {

  private def vecArg = children(0)
  protected def subOffsetsArg: Expression = children(1)
  protected def cellIdsArg: Expression = children(2)
  protected def coordsArg: Expression = children(3)
  private def ccArg = children(4)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size != 5)
      return TypeCheckResult.TypeCheckFailure(s"$prettyName expects 5 arguments")
    vecArg.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        ccArg.dataType match {
          case ArrayType(DoubleType, _) if ccArg.foldable =>
            checkBookArgs() match {
              case TypeCheckResult.TypeCheckSuccess =>
                // cc is indexed by global cell index in the encode loop; a
                // short cc would AIOOBE at execution, so pin its arity here.
                ccArg.eval(null) match {
                  case null => TypeCheckResult.TypeCheckFailure(
                    s"$prettyName expects a non-NULL cc argument")
                  case a: ArrayData if a.numElements() != bookCellCount =>
                    TypeCheckResult.TypeCheckFailure(
                      s"$prettyName cc/cellIds arity mismatch: ${a.numElements()} vs $bookCellCount")
                  case _ => TypeCheckResult.TypeCheckSuccess
                }
              case fail => fail
            }
          case _ => TypeCheckResult.TypeCheckFailure(
            s"$prettyName expects a literal array<double> cc argument")
        }
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double> vector, got ${other.sql}")
    }
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  @transient private lazy val cc: Array[Double] = {
    val a = ccArg.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(a.numElements())(a.getDouble)
  }
  @transient private lazy val vecIsFloat =
    vecArg.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vAny = vecArg.eval(input)
    if (vAny == null) return null
    val v = vAny.asInstanceOf[ArrayData]
    if (v.numElements() != m * subDim) return null
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = Double.PositiveInfinity
      var bi = -1
      var ci = subOffsets(s)
      while (ci < subOffsets(s + 1)) {
        var dot = 0.0
        var j = 0
        while (j < subDim) {
          val idx = s * subDim + j
          if (v.isNullAt(idx)) return null
          val x = if (vecIsFloat) v.getFloat(idx).toDouble else v.getDouble(idx)
          dot += x * coords(ci * subDim + j)
          j += 1
        }
        val score = cc(ci) - 2.0 * dot
        if (score < best) { best = score; bi = ci }
        ci += 1
      }
      out(s) = cellIds(bi)
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** `graft_pq_recon(codes, subOffsets, cellIds, coords)` →
  * `array<double>`: the concatenation of the assigned sub-centroids —
  * the vector ADC scores. Pure table lookup, no argmin, so deriving
  * `recon` from a materialized `codes` column runs the expensive
  * encode exactly once per row. NULL on NULL input, wrong code count,
  * or an unknown cell id. */
case class PqReconFromCodes(children: Seq[Expression])
    extends Expression with PqBooksArgs with CodegenFallback {

  private def codesArg = children(0)
  protected def subOffsetsArg: Expression = children(1)
  protected def cellIdsArg: Expression = children(2)
  protected def coordsArg: Expression = children(3)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size != 4)
      return TypeCheckResult.TypeCheckFailure(s"$prettyName expects 4 arguments")
    codesArg.dataType match {
      case ArrayType(IntegerType, _) => checkBookArgs()
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<int> codes, got ${other.sql}")
    }
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_recon"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val cAny = codesArg.eval(input)
    if (cAny == null) return null
    val codes = cAny.asInstanceOf[ArrayData]
    if (codes.numElements() != m) return null
    val out = new Array[Double](m * subDim)
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val cell = codes.getInt(s)
      var ci = subOffsets(s)
      var found = -1
      while (ci < subOffsets(s + 1) && found < 0) {
        if (cellIds(ci) == cell) found = ci
        ci += 1
      }
      if (found < 0) return null
      System.arraycopy(coords, found * subDim, out, s * subDim, subDim)
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object PqCodec {
  val encodeInfo: ExpressionInfo = new ExpressionInfo(
    classOf[PqEncode].getCanonicalName, null, "graft_pq_encode",
    "graft_pq_encode(vec, subOffsets, cellIds, coords, cc) - PQ code assignment per subspace", "")
  val encodeBuilder: Seq[Expression] => Expression = {
    case args if args.size == 5 => PqEncode(args)
    case args => throw new IllegalArgumentException(
      s"graft_pq_encode expects 5 arguments, got ${args.length}")
  }

  val reconInfo: ExpressionInfo = new ExpressionInfo(
    classOf[PqReconFromCodes].getCanonicalName, null, "graft_pq_recon",
    "graft_pq_recon(codes, subOffsets, cellIds, coords) - PQ centroid reconstruction from codes", "")
  val reconBuilder: Seq[Expression] => Expression = {
    case args if args.size == 4 => PqReconFromCodes(args)
    case args => throw new IllegalArgumentException(
      s"graft_pq_recon expects 4 arguments, got ${args.length}")
  }
}
