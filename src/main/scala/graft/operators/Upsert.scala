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

  private def deleteRecursively(p: Path): Unit =
    graft.sources.LocalFs.deleteRecursively(p)
}
