package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the multi-dimensional file
  * layout technique: interleave the bits of two dimension keys so
  * that sorting by the combined value co-locates rows that are close
  * in BOTH dimensions, and parquet row-group min/max stats prune
  * scans filtered on EITHER dimension. A single-column sort gives
  * perfect pruning on one dimension and none on the other; z-order
  * trades a little of the first for most of the second — the standard
  * layout for "filter by user AND by date" fact workloads at 100 TB.
  *
  * Not part of the reference's surface — a SURVEY.md §7.4 north-star
  * extension complementing [[graft.sources.LayerWriter]]'s
  * date-partitioned layout (partitions prune the coarse dimension;
  * z-order handles the within-partition residual).
  *
  * The interleave is UNROLLED bitwise arithmetic (`&`, `<<`, `|`) —
  * fully inside WholeStageCodegen, and replayed verbatim by the
  * DuckDB oracle (both engines share C-style bit semantics on int64).
  * Inputs must be NON-NEGATIVE and should fit in `bits` bits: the
  * interleave reads only the low `bits` bits of each key, so wider
  * values alias by truncation (fine for a LAYOUT key — aliased rows
  * merely co-locate — but callers wanting clean rectangles bucket
  * their dimensions first, as the catalog query does with pmod).
  */
object ZOrder {

  /** Morton value of two non-negative dimension keys, interleaving
    * the low `bits` bits of each (a in even positions, b in odd):
    * z = Σᵢ ((a & 2ⁱ) << i) | ((b & 2ⁱ) << (i+1)). `bits` ≤ 31 keeps
    * the result in int64. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "zValue supports 1..31 bits per dimension")
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(al.bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(bl.bitwiseAND(lit(1L << i)), i + 1))
    }
  }

  /** Writes `df` as `targetFiles` parquet files range-partitioned and
    * sorted on the z-value of (aCol, bCol) — each file covers a small
    * rectangle of the (a, b) space, so row-group stats prune reads
    * filtered on either column. The z column is kept in the output
    * (readers sort/merge on it; dropping it would cost a recompute). */
  def writeZOrdered(df: DataFrame, aCol: String, bCol: String, bits: Int,
      targetFiles: Int, outDir: String): Unit = {
    require(targetFiles > 0, "writeZOrdered needs targetFiles > 0")
    df.withColumn("zval", zValue(col(aCol), col(bCol), bits))
      .repartitionByRange(targetFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
      .write.mode("overwrite").parquet(outDir)
  }
}
