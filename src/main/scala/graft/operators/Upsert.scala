package graft.operators

import graft.sources.SwapFs
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE-emulation upsert without a table format (SURVEY.md §2.3 J3,
  * §7.4 risk #1; reference MERGE at
  * /root/reference/sql/02_load_data.sql:78-165).
  *
  * Logical form: `target ANTI JOIN source ∪ source` — matched keys
  * take the source row wholesale (reference updates every column on
  * match), unmatched target rows survive, new keys insert. Re-running
  * with the same source is idempotent.
  *
  * Physical form for parquet directories: write the merged result to
  * a temp sibling path, then atomically swap directories — never read
  * and overwrite the same location in one job (Spark would corrupt
  * the input it is still scanning). All filesystem operations go
  * through the Hadoop `FileSystem` API ([[graft.sources.SwapFs]]), so
  * the same code runs on `file:`, HDFS, and object stores; the
  * atomic-rename caveat for flat object stores is documented there.
  *
  * Scale: the anti-join shuffles both sides by key once (or broadcasts
  * the source batch when it is small — the common incremental case,
  * which Catalyst/AQE picks automatically); unmatched target rows are
  * NOT rewritten row-by-row anywhere except the final write, which is
  * unavoidable without a transactional format's file-level rewrite.
  */
object Upsert {

  /** Pure-frame upsert: rows in `source` replace same-key rows in
    * `target`; all other target rows pass through. */
  def upsertBatch(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame =
    target.join(source, keys, "left_anti").unionByName(source)

  /** Keyed upsert into a parquet directory via rename-based swap:
    * write merged → tmp, rename target → .old (atomic on
    * rename-capable filesystems), rename tmp → target, drop .old. No
    * crash window loses data — at worst the previous state survives
    * at `.old-merge` and is restored on the next call. Creates the
    * target on first use. Returns the merged row count. */
  def mergeIntoPath(spark: SparkSession, targetPath: String,
      source: DataFrame, keys: Seq[String]): Long = {
    val io = SwapFs.forPath(spark, targetPath)
    val tgt = io.path(targetPath)
    val tmp = io.path(targetPath + ".tmp-merge")
    val old = io.path(targetPath + ".old-merge")
    // crash recovery: a missing target with a surviving .old means a
    // prior run died mid-swap — restore before merging
    if (!io.exists(tgt) && io.exists(old)) io.rename(old, tgt)
    val merged =
      if (io.exists(tgt)) upsertBatch(spark.read.parquet(targetPath), source, keys)
      else source
    io.delete(tmp)
    // row count via observe metrics on the write job itself — a
    // re-read-and-count would scan the whole merged output a second
    // time, which at scale doubles the cost of every merge
    val obs = Observation()
    merged.observe(obs, count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(tmp.toString)
    val n = obs.get("n").asInstanceOf[Long]
    io.delete(old)
    if (io.exists(tgt)) io.rename(tgt, old)
    io.rename(tmp, tgt)
    io.delete(old)
    n
  }

  /** PARTITION-SCOPED MERGE into a hive-partitioned parquet layout —
    * the incremental form [[mergeIntoPath]] cannot give (it rewrites
    * the WHOLE target every batch, documented): only partitions that
    * can change are rewritten. Affected set = partitions holding
    * source rows ∪ target partitions holding MATCHED keys (found with
    * one column-pruned semi probe — the scan reads the key columns
    * only; partition values come from directory names). Untouched
    * partitions' files are never rewritten (byte-identical after the
    * merge — UpsertSpec pins this), so a date-partitioned 100 TB fact
    * pays O(touched partitions) per batch, not O(target).
    *
    * The matched-key probe is itself BOUNDED by a per-partition
    * key-range index (`_keyidx` inside the target: one tiny parquet
    * row per partition holding min/max of every key column,
    * maintained by this writer). Before the semi probe runs, the
    * batch's global key ranges are intersected with the index and the
    * probe scan is partition-pruned to the candidate partitions — so
    * a batch touching one partition of a 100 TB fact reads one
    * partition's key columns, not every partition's (UpsertSpec pins
    * this with scan-metric accounting). Soundness: the index is
    * maintained OVER-INCLUSIVE — it is rewritten before the data swap
    * as the union of old and new ranges, so whatever side of a crash
    * the layout lands on, every key physically present in a partition
    * lies inside that partition's recorded range; pruning only drops
    * partitions whose recorded range is provably disjoint from the
    * batch. A missing, malformed, or stale index (detected by
    * partition-directory accounting — every live partition must have
    * an index row) degrades to the full-scan probe and is rebuilt in
    * the same merge. External writers that bypass this method must
    * drop `_keyidx` ([[graft.sources.LayerWriter
    * .overwriteBatchPartitions]] does).
    *
    * Semantics are identical to [[mergeIntoPath]]: matched keys take
    * the source row wholesale — INCLUDING a changed partition value
    * (the old row's partition is in the affected set via the semi
    * probe, so the row MOVES; a scoped-to-source-partitions-only
    * design would leave a stale duplicate behind). A partition whose
    * rows ALL move away is deleted. Affected partition values are a
    * bounded driver fetch capped at `maxPartitions` (loud failure —
    * a batch touching more partitions than that should take the full
    * [[mergeIntoPath]] path instead). Physical form: merged affected
    * partitions land in a temp sibling, then swap per-partition-
    * directory (atomic renames on rename-capable filesystems). A
    * crash mid-swap leaves each partition either old or new, never
    * mixed; re-running the same merge is idempotent and heals —
    * EXPLICITLY: entry first restores any `*.old-pmerge` leftover
    * whose live directory is missing (and drops leftovers whose
    * install completed), so crashed-partition rows rejoin the probe
    * before any index pruning can run (UpsertSpec pins both windows).
    * Creates the target (full partitioned write) on first use.
    * Partition values compare in CAST-to-string space, matching
    * Spark's own partition-path rendering for string/date/integral
    * columns. Returns the merged row count over the AFFECTED
    * partitions. */
  def mergePartitionedPath(spark: SparkSession, targetPath: String,
      source: DataFrame, keys: Seq[String], partCol: String,
      maxPartitions: Int = 4096): Long = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val io = SwapFs.forPath(spark, targetPath)
    val tgt = io.path(targetPath)
    val old = io.path(targetPath + ".old-merge")
    if (!io.exists(tgt) && io.exists(old)) io.rename(old, tgt)
    if (!io.exists(tgt)) {
      val obs0 = Observation()
      source.observe(obs0, count(lit(1)).as("n"))
        .write.mode("overwrite").partitionBy(partCol).parquet(targetPath)
      // index from the WRITTEN layout, not a second execution of the
      // caller's source plan (which may be an arbitrarily expensive
      // upstream job): a column-pruned read-back of the fresh parquet
      // yields the same per-partition ranges for one metadata-cheap
      // scan — the merge path's own newStats pattern
      val wroteSchema = org.apache.spark.sql.types.StructType(source.schema.map(f =>
        if (f.name == partCol) f.copy(dataType = org.apache.spark.sql.types.StringType) else f))
      writeKeyStats(io, targetPath,
        keyStats(spark.read.schema(wroteSchema).parquet(targetPath), partCol, keys))
      return obs0.get("n").asInstanceOf[Long]
    }
    val prefix = s"$partCol="
    // crash recovery BEFORE anything reads the target: a leftover
    // `d=X.old-pmerge` means a prior run died inside the swap window.
    // If d=X is absent the install never happened — rename the old
    // copy back (the pre-merge rows must rejoin the probe, or a
    // pruned probe would miss their keys and the swap loop's leading
    // delete would destroy the only copy: silent data loss). If d=X
    // exists the install completed — drop the leftover. This also
    // removes the pre-r13 wart where a recovering read surfaced the
    // leftover as a bogus partition VALUE ("X.old-pmerge").
    for (name <- io.listDirNames(tgt) if name.endsWith(".old-pmerge")) {
      val live = new org.apache.hadoop.fs.Path(tgt, name.stripSuffix(".old-pmerge"))
      val leftover = new org.apache.hadoop.fs.Path(tgt, name)
      if (io.exists(live)) io.delete(leftover)
      else io.rename(leftover, live)
    }
    val target = spark.read.parquet(targetPath)
    val srcParts = source.select(col(partCol).cast("string").as("p")).distinct()
    val srcKeys = source.select(keys.map(col): _*).distinct()
    // candidate-partition prefilter from the key-range index: the
    // probe below only READS partitions whose recorded key ranges
    // intersect the batch's — O(touched) I/O instead of O(target)
    val validStats = readValidKeyStats(spark, io, tgt, targetPath, prefix, keys)
    val probed = validStats match {
      case Some(stats) =>
        val boundAggs = keys.zipWithIndex.flatMap { case (k, i) =>
          Seq(min(col(k)).as(s"bmin_$i"), max(col(k)).as(s"bmax_$i")) }
        val bounds = srcKeys.agg(boundAggs.head, boundAggs.tail: _*)
        val overlap = keys.indices.map { i =>
          col(s"max_$i") >= col(s"bmin_$i") && col(s"min_$i") <= col(s"bmax_$i")
        }.reduce(_ && _)
        val candRows = stats.crossJoin(broadcast(bounds)).filter(overlap)
          .select(col("p")).collect()
        val candHasNull = candRows.exists(_.isNullAt(0))
        val cand = candRows.filterNot(_.isNullAt(0)).map(_.getString(0))
        val inCand = col(partCol).cast("string").isin(cand.toIndexedSeq: _*)
        target.filter(if (candHasNull) inCand || col(partCol).isNull else inCand)
      case None => target
    }
    val hitParts = probed.join(srcKeys, keys, "left_semi")
      .select(col(partCol).cast("string").as("p")).distinct()
    val partRows = srcParts.unionByName(hitParts).distinct()
      .limit(maxPartitions + 1).collect()
    require(partRows.length <= maxPartitions,
      s"mergePartitionedPath: batch touches more than $maxPartitions partitions " +
        s"of $targetPath — use mergeIntoPath (full rewrite) for rewrite-everything batches")
    val hasNull = partRows.exists(_.isNullAt(0))
    val parts = partRows.filterNot(_.isNullAt(0)).map(_.getString(0))
    val inParts = col(partCol).cast("string").isin(parts.toIndexedSeq: _*)
    val scoped = target.filter(if (hasNull) inParts || col(partCol).isNull else inParts)
    val merged = upsertBatch(scoped, source, keys)
    val tmp = io.path(targetPath + ".tmp-pmerge")
    io.delete(tmp)
    val obs = Observation()
    merged.observe(obs, count(lit(1)).as("n"))
      .write.mode("overwrite").partitionBy(partCol).parquet(tmp.toString)
    val n = obs.get("n").asInstanceOf[Long]
    // refresh the key-range index BEFORE the data swap, widened to
    // the union of old and new ranges (over-inclusive = prune-safe on
    // either side of a crash). New ranges come from a column-pruned
    // read of the just-written affected partitions; a missing/stale
    // index is rebuilt here from the full pre-merge target (one-time
    // backfill, same cost class as the full probe it just paid).
    val tmpSchema = org.apache.spark.sql.types.StructType(merged.schema.map(f =>
      if (f.name == partCol) f.copy(dataType = org.apache.spark.sql.types.StringType) else f))
    val newStats = keyStats(spark.read.schema(tmpSchema).parquet(tmp.toString), partCol, keys)
    val oldStats = validStats.getOrElse(keyStats(target, partCol, keys))
    val statAggs = keys.indices.flatMap(i =>
      Seq(min(col(s"min_$i")).as(s"min_$i"), max(col(s"max_$i")).as(s"max_$i")))
    val widened = oldStats.unionByName(newStats)
      .groupBy(col("p")).agg(statAggs.head, statAggs.tail: _*)
    writeKeyStats(io, targetPath, widened)
    val tmpDirNames = io.listDirNames(tmp).filter(_.startsWith(prefix))
    for (name <- tmpDirNames) {
      val dst = new org.apache.hadoop.fs.Path(tgt, name)
      val oldPart = io.path(dst.toString + ".old-pmerge")
      io.delete(oldPart)
      if (io.exists(dst)) io.rename(dst, oldPart)
      io.rename(new org.apache.hadoop.fs.Path(tmp, name), dst)
      io.delete(oldPart)
    }
    // an affected partition ABSENT from the merged output lost every
    // row (all its keys moved to other partitions) — drop it, or the
    // stale rows would duplicate their moved selves
    val affectedNames = parts.map(v => prefix + ExternalCatalogUtils.escapePathName(v)).toSet ++
      (if (hasNull) Set(prefix + ExternalCatalogUtils.DEFAULT_PARTITION_NAME) else Set.empty[String])
    for (name <- affectedNames -- tmpDirNames)
      io.delete(new org.apache.hadoop.fs.Path(tgt, name))
    io.delete(tmp)
    n
  }

  /** Directory name of the per-partition key-range index inside a
    * partitioned target. Underscore-prefixed, so Spark's file index
    * never picks it up as data. */
  private val KeyStatsDir = "_keyidx"

  /** Per-partition key ranges: one row per partition value (string
    * space, matching the merge's own partition comparisons) with
    * min/max of each key column in its native type. Column-pruned
    * map-side aggregate — O(partitions) output. */
  private def keyStats(df: DataFrame, partCol: String, keys: Seq[String]): DataFrame = {
    val aggs = keys.zipWithIndex.flatMap { case (k, i) =>
      Seq(min(col(k)).as(s"min_$i"), max(col(k)).as(s"max_$i")) }
    df.groupBy(col(partCol).cast("string").as("p")).agg(aggs.head, aggs.tail: _*)
  }

  /** Swap-write the key-range index (tiny: one row per partition). A
    * crash between delete and rename leaves no index — the next merge
    * falls back to the full probe and rebuilds. */
  private def writeKeyStats(io: SwapFs, targetPath: String, stats: DataFrame): Unit = {
    val live = io.path(targetPath + "/" + KeyStatsDir)
    val tmp = io.path(targetPath + "/" + KeyStatsDir + ".tmp")
    io.delete(tmp)
    stats.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    io.delete(live)
    io.rename(tmp, live)
  }

  /** Read the key-range index, validating it against reality before
    * trusting it for pruning: the schema must be exactly what this
    * writer produces AND every live partition directory must have an
    * index row (extra index rows for since-deleted partitions are
    * fine — over-inclusion never breaks pruning soundness). Any
    * doubt → None → the caller full-scans and rebuilds. */
  private def readValidKeyStats(spark: SparkSession, io: SwapFs,
      tgt: org.apache.hadoop.fs.Path, targetPath: String, prefix: String,
      keys: Seq[String]): Option[DataFrame] = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val live = io.path(targetPath + "/" + KeyStatsDir)
    if (!io.exists(live)) return None
    val expected = ("p" +: keys.indices.flatMap(i => Seq(s"min_$i", s"max_$i"))).toSeq
    val stats =
      try spark.read.parquet(live.toString)
      catch { case scala.util.control.NonFatal(_) => return None }
    if (stats.columns.toSeq != expected) return None
    val statVals = stats.select(col("p")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getString(0))).toSet
    val diskVals = io.listDirNames(tgt).iterator
      .filter(n => n.startsWith(prefix) && !n.contains(".old-pmerge"))
      .map(_.stripPrefix(prefix))
      .map(v => if (v == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) None
                else Some(ExternalCatalogUtils.unescapePathName(v)))
      .toSet
    if (diskVals.subsetOf(statVals)) Some(stats) else None
  }
}
