package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.slf4j.LoggerFactory

/** Hadoop-`FileSystem` edition of the directory-swap primitives used
  * by the MERGE emulation ([[graft.operators.Upsert]]) and layout
  * maintenance ([[LayerWriter.compactFact]]).
  *
  * The swap protocol (write merged output to a temp sibling, rename
  * target aside, rename temp in, drop the old copy) was originally
  * written against `java.nio.file` — which only exists on a local
  * POSIX volume. The 100 TB deployment target keeps the fact on
  * HDFS/S3/ABFS, so every filesystem touch here goes through
  * `org.apache.hadoop.fs.FileSystem` resolved from the path's scheme
  * against the session's Hadoop configuration: `file:` and bare paths
  * exercise the exact same code locally (Hadoop's `LocalFileSystem`),
  * `hdfs:`/`viewfs:`/`abfs:` get metadata-atomic directory renames in
  * production, and nothing in the merge/compaction family needs a
  * local disk any more.
  *
  * Atomicity caveat, stated rather than hidden: HDFS, local FS, and
  * hierarchical-namespace ABFS rename directories as a single
  * metadata operation, so the crash-window analysis in
  * [[graft.operators.Upsert.mergeIntoPath]] holds as written. Flat
  * object stores (s3/s3a/gs/wasb/oss/...) emulate rename as
  * copy+delete — O(data) and non-atomic — so on those schemes the
  * swap degrades from "old or new, never mixed" to "eventually new,
  * torn window possible". [[SwapFs.forPath]] logs one loud warning
  * per such scheme; a production deployment on an object store should
  * front the layout with a manifest/table format whose snapshot
  * commit restores atomicity (the reference gets this for free from
  * the warehouse — /root/reference/sql/02_load_data.sql:78-165 MERGE
  * is warehouse-atomic). Reads, writes, deletes, and listings here
  * are correct on every scheme regardless.
  */
final class SwapFs private[sources] (val fs: FileSystem) {

  /** Qualify a user path string against this filesystem. */
  def path(s: String): HPath = fs.makeQualified(new HPath(s))

  def exists(p: HPath): Boolean = fs.exists(p)

  /** Recursive delete; no-op when absent, loud when the FS refuses. */
  def delete(p: HPath): Unit =
    if (fs.exists(p) && !fs.delete(p, true))
      sys.error(s"SwapFs: filesystem refused to delete $p")

  /** Rename with the swap protocol's precondition made explicit: the
    * destination must be absent. (Hadoop's `rename` is not uniform
    * when the destination exists — some implementations move the
    * source INTO an existing directory — so the protocol never calls
    * it that way, and this guard turns a protocol bug into a loud
    * failure instead of a silently nested directory.) */
  def rename(src: HPath, dst: HPath): Unit = {
    require(!fs.exists(dst), s"SwapFs.rename: destination $dst already exists")
    if (!fs.rename(src, dst))
      sys.error(s"SwapFs: filesystem refused to rename $src -> $dst")
  }

  /** Names of the immediate child directories of `p` (empty when `p`
    * is absent) — partition-directory enumeration for the scoped
    * merge. O(children) metadata calls, no data reads. */
  def listDirNames(p: HPath): Set[String] =
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).iterator.filter(_.isDirectory).map(_.getPath.getName).toSet

  /** Count of data files under `p` (recursive), by extension.
    * Deliberately via plain `listStatus` recursion, NOT
    * `fs.listFiles(p, recursive)`: the latter materializes
    * `LocatedFileStatus` — a per-file block-location lookup that costs
    * milliseconds per file on local/checksum filesystems (measured:
    * 8.8 s over the 2,430 pre-compaction small files at sf10, versus
    * ~0.1 s for the status-only walk). A file COUNT needs names, not
    * block maps. */
  def dataFileCount(p: HPath, suffix: String = ".parquet"): Long = {
    if (!fs.exists(p)) return 0L
    var n = 0L
    var stack = List(p)
    while (stack.nonEmpty) {
      val d = stack.head; stack = stack.tail
      fs.listStatus(d).foreach { st =>
        val name = st.getPath.getName
        // Spark's hidden-path rule: `_`/`.`-prefixed entries are not
        // data — skipping them keeps the count honest on targets that
        // carry a merge key-range index (`_keyidx`) inside
        if (name.startsWith("_") || name.startsWith(".")) ()
        else if (st.isDirectory) stack ::= st.getPath
        else if (name.endsWith(suffix)) n += 1
      }
    }
    n
  }
}

object SwapFs {
  private val log = LoggerFactory.getLogger(getClass)

  /** Schemes whose `rename` is a copy+delete emulation, not a
    * metadata operation — the swap still converges but loses its
    * atomic crash window (see class scaladoc). */
  private val copyRenameSchemes =
    Set("s3", "s3a", "s3n", "gs", "wasb", "wasbs", "oss", "cos", "swift")
  private val warnedSchemes =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Resolve the filesystem owning `path` from the session's Hadoop
    * configuration (scheme-less paths hit `fs.defaultFS`, i.e. the
    * local FS in tests and HDFS on a real cluster). */
  def forPath(spark: SparkSession, path: String): SwapFs = {
    val p = new HPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val scheme = fs.getUri.getScheme
    if (scheme != null && copyRenameSchemes(scheme) && warnedSchemes.add(scheme))
      log.warn(s"SwapFs on '$scheme': directory rename is copy+delete on this store — " +
        "the merge/compaction swap is not atomic here; front the layout with a " +
        "manifest/table format for transactional commits")
    new SwapFs(fs)
  }
}
