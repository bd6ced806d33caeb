package graft.operators

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

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
  * the input it is still scanning).
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
    * write merged → tmp, rename target → .old (atomic), rename tmp →
    * target (atomic), drop .old. No crash window loses data — at
    * worst the previous state survives at `.old-merge` and is
    * restored on the next call. Creates the target on first use.
    * Returns the merged row count. */
  def mergeIntoPath(spark: SparkSession, targetPath: String,
      source: DataFrame, keys: Seq[String]): Long = {
    val tgt = Paths.get(targetPath)
    val tmp = Paths.get(targetPath + ".tmp-merge")
    val old = Paths.get(targetPath + ".old-merge")
    // crash recovery: a missing target with a surviving .old means a
    // prior run died mid-swap — restore before merging
    if (!Files.exists(tgt) && Files.exists(old))
      Files.move(old, tgt, StandardCopyOption.ATOMIC_MOVE)
    val merged =
      if (Files.exists(tgt)) upsertBatch(spark.read.parquet(targetPath), source, keys)
      else source
    deleteRecursively(tmp)
    // row count via observe metrics on the write job itself — a
    // re-read-and-count would scan the whole merged output a second
    // time, which at scale doubles the cost of every merge
    val obs = Observation()
    merged.observe(obs, count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(tmp.toString)
    val n = obs.get("n").asInstanceOf[Long]
    deleteRecursively(old)
    if (Files.exists(tgt)) Files.move(tgt, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, tgt, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(old)
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
    * directory (atomic renames). A crash mid-swap leaves each
    * partition either old or new, never mixed; re-running the same
    * merge is idempotent and heals. Creates the target (full
    * partitioned write) on first use. Partition values compare in
    * CAST-to-string space, matching Spark's own partition-path
    * rendering for string/date/integral columns. Returns the merged
    * row count over the AFFECTED partitions. */
  def mergePartitionedPath(spark: SparkSession, targetPath: String,
      source: DataFrame, keys: Seq[String], partCol: String,
      maxPartitions: Int = 4096): Long = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val tgt = Paths.get(targetPath)
    val old = Paths.get(targetPath + ".old-merge")
    if (!Files.exists(tgt) && Files.exists(old))
      Files.move(old, tgt, StandardCopyOption.ATOMIC_MOVE)
    if (!Files.exists(tgt)) {
      val obs0 = Observation()
      source.observe(obs0, count(lit(1)).as("n"))
        .write.mode("overwrite").partitionBy(partCol).parquet(targetPath)
      return obs0.get("n").asInstanceOf[Long]
    }
    val target = spark.read.parquet(targetPath)
    val srcParts = source.select(col(partCol).cast("string").as("p")).distinct()
    val srcKeys = source.select(keys.map(col): _*).distinct()
    val hitParts = target.join(srcKeys, keys, "left_semi")
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
    val tmp = Paths.get(targetPath + ".tmp-pmerge")
    deleteRecursively(tmp)
    val obs = Observation()
    merged.observe(obs, count(lit(1)).as("n"))
      .write.mode("overwrite").partitionBy(partCol).parquet(tmp.toString)
    val n = obs.get("n").asInstanceOf[Long]
    val prefix = s"$partCol="
    val tmpDirNames = listDirNames(tmp).filter(_.startsWith(prefix))
    for (name <- tmpDirNames) {
      val dst = tgt.resolve(name)
      val oldPart = Paths.get(dst.toString + ".old-pmerge")
      deleteRecursively(oldPart)
      if (Files.exists(dst)) Files.move(dst, oldPart, StandardCopyOption.ATOMIC_MOVE)
      Files.move(tmp.resolve(name), dst, StandardCopyOption.ATOMIC_MOVE)
      deleteRecursively(oldPart)
    }
    // an affected partition ABSENT from the merged output lost every
    // row (all its keys moved to other partitions) — drop it, or the
    // stale rows would duplicate their moved selves
    val affectedNames = parts.map(v => prefix + ExternalCatalogUtils.escapePathName(v)).toSet ++
      (if (hasNull) Set(prefix + ExternalCatalogUtils.DEFAULT_PARTITION_NAME) else Set.empty[String])
    for (name <- affectedNames -- tmpDirNames)
      deleteRecursively(tgt.resolve(name))
    deleteRecursively(tmp)
    n
  }

  private def listDirNames(p: Path): Set[String] = {
    if (!Files.exists(p)) return Set.empty
    val s = Files.list(p)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(Files.isDirectory(_))
        .map(_.getFileName.toString).toSet
    } finally s.close()
  }

  private def deleteRecursively(p: Path): Unit =
    graft.sources.LocalFs.deleteRecursively(p)
}
