package graft.tools

import graft.Sessions
import graft.operators.Upsert
import org.apache.spark.sql.functions._

/** Measures mergePartitionedPath's per-batch cost as the UNTOUCHED
  * partition count grows, for BOTH key shapes:
  *
  *  - `seq`: sequential long keys (range-clustered — each partition's
  *    [min,max] is disjoint, so the RANGE half of the index prunes);
  *  - `sha`: sha256 hex-string keys (hash-distributed — every
  *    partition's range spans the key space and only the index's
  *    record-level (key-hash, partition) side can prune; the
  *    reference's own surrogate-key shape,
  *    /root/reference/sql/02_load_data.sql:86).
  *
  * A target with N partitions (fixed rows per partition) takes a
  * one-partition 50-key batch. With the key index the probe is pruned
  * to candidates, so batch cost must stay ~flat in N for BOTH shapes;
  * without it (index deleted before the merge) the probe scans all N
  * partitions' key columns. The `maint` sweep holds the batch fixed
  * and grows N to 4096 to price the per-merge INDEX MAINTENANCE — the
  * index is chunked (`c<ver>-<n>.parquet` meta + `_rec/r<ver>-*`
  * record files, max-ver winners, compaction past MaxChunks), so
  * maintenance writes O(1) files and O(affected) bytes per merge,
  * never O(all partitions). The `bigcard` sweep is the r15 frontier
  * gate: sha keys at 5 M keys/partition — past the r14 Bloom
  * sidecars' ~200k saturation cap, where the old design silently
  * degraded to the full O(target) probe — with the indexed curve
  * required ~flat in N while the bare curve grows with the corpus.
  * Prints one line per (shape, N, mode). args(0) selects
  * probe|maint|bigcard|all (default all). */
object ProbeScaling {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-probe-scaling")
    val which = if (args.nonEmpty) args(0) else "all"

    def fact(nParts: Int, rowsPerPart: Long, sha: Boolean) = {
      val ids = spark.range(0L, nParts.toLong * rowsPerPart)
      val k = if (sha) sha2(concat(lit("k"), col("id").cast("string")), 256) else col("id")
      ids.select(k.as("k"),
        date_format(date_add(lit("2020-01-01").cast("date"),
          (col("id") / rowsPerPart).cast("int")), "yyyy-MM-dd").as("d"),
        (col("id") * 3).as("v"))
    }
    def batch(sha: Boolean) = {
      val ids = spark.range(0L, 50L)
      val k = if (sha) sha2(concat(lit("k"), col("id").cast("string")), 256) else col("id")
      ids.select(k.as("k"), lit("2020-01-01").as("d"), lit(-1L).as("v"))
    }
    def timedMerge(path: String, sha: Boolean): Double = {
      val t0 = System.nanoTime()
      Upsert.mergePartitionedPath(spark, path, batch(sha), Seq("k"), "d")
      (System.nanoTime() - t0) / 1e9
    }
    def dropIndex(path: String): Unit = {
      val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path + "/_keyidx"), true)
    }

    // probe-bound curves: indexed vs index-deleted, both key shapes
    // (first N=8 run is JIT/shuffle warmup — discard)
    if (which == "all" || which == "probe")
      for ((shape, sha, rowsPerPart) <- Seq(("seq", false, 200000L), ("sha", true, 100000L));
           nParts <- Seq(8, 8, 64, 512)) {
        val work = graft.sources.LocalFs.scratchDir("graft_probe_scaling")
        try {
          val path = s"$work/fact"
          Upsert.mergePartitionedPath(spark, path, fact(nParts, rowsPerPart, sha), Seq("k"), "d")
          for (mode <- Seq("indexed", "noindex")) {
            if (mode == "noindex") dropIndex(path)
            val s = timedMerge(path, sha)
            println(f"PROBE shape=$shape%-4s parts=$nParts%4d mode=$mode%-8s merge=$s%.2f s")
          }
        } finally graft.sources.LocalFs.deleteRecursively(work)
      }

    // maintenance curve: same 50-key single-partition batch, N up to
    // 4096 (the 100 TB daily-partitioned regime), always indexed —
    // isolates per-merge index upkeep + probe, which must not grow
    // O(N). Fewer rows per partition: the point is partition COUNT.
    if (which == "all" || which == "maint")
      for (nParts <- Seq(512, 2048, 4096)) {
        val work = graft.sources.LocalFs.scratchDir("graft_probe_maint")
        try {
          val path = s"$work/fact"
          Upsert.mergePartitionedPath(spark, path, fact(nParts, 20000L, sha = true), Seq("k"), "d")
          val s1 = timedMerge(path, sha = true)
          val s2 = timedMerge(path, sha = true)
          println(f"MAINT parts=$nParts%4d merge1=$s1%.2f s merge2=$s2%.2f s")
        } finally graft.sources.LocalFs.deleteRecursively(work)
      }

    // high-cardinality curve (r15): 5M sha keys PER PARTITION — an
    // order of magnitude past the r14 Bloom cap. Indexed merges must
    // stay ~flat in N (probe = O(batch) record-base buckets + the
    // touched partition); bare merges scan every partition's key
    // column. The second indexed merge also exercises the chunk
    // overlay (the first leaves an un-compacted record chunk).
    if (which == "all" || which == "bigcard")
      for (nParts <- Seq(4, 16, 48)) {
        val work = graft.sources.LocalFs.scratchDir("graft_probe_bigcard")
        try {
          val path = s"$work/fact"
          val t0 = System.nanoTime()
          Upsert.mergePartitionedPath(spark, path, fact(nParts, 5000000L, sha = true),
            Seq("k"), "d")
          val init = (System.nanoTime() - t0) / 1e9
          val s1 = timedMerge(path, sha = true)
          val s2 = timedMerge(path, sha = true)
          dropIndex(path)
          val bare = timedMerge(path, sha = true)
          println(f"BIGCARD parts=$nParts%3d keys/part=5000000 init=$init%.1f s " +
            f"indexed1=$s1%.2f s indexed2=$s2%.2f s bare=$bare%.2f s")
        } finally graft.sources.LocalFs.deleteRecursively(work)
      }
  }
}
