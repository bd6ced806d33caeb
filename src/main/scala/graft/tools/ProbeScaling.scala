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
  *    partition's range spans the key space and only the
  *    per-partition Bloom sidecars can prune; the reference's own
  *    surrogate-key shape, /root/reference/sql/02_load_data.sql:86).
  *
  * A target with N partitions (fixed rows per partition) takes a
  * one-partition 50-key batch. With the key index the probe is pruned
  * to candidates, so batch cost must stay ~flat in N for BOTH shapes;
  * without it (index deleted before the merge) the probe scans all N
  * partitions' key columns. The third sweep holds the batch fixed and
  * grows N to 4096 to price the per-merge INDEX MAINTENANCE — v2
  * stores one index file per partition and rewrites only affected
  * ones, so maintenance must be ~flat in N too (a monolithic index
  * file would make every merge pay an O(N) rewrite). Prints one line
  * per (shape, N, mode). */
object ProbeScaling {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-probe-scaling")

    def fact(nParts: Int, rowsPerPart: Int, sha: Boolean) = {
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

    // probe-bound curves: indexed vs index-deleted, both key shapes
    // (first N=8 run is JIT/shuffle warmup — discard)
    for ((shape, sha, rowsPerPart) <- Seq(("seq", false, 200000), ("sha", true, 100000));
         nParts <- Seq(8, 8, 64, 512)) {
      val work = graft.sources.LocalFs.scratchDir("graft_probe_scaling")
      try {
        val path = s"$work/fact"
        Upsert.mergePartitionedPath(spark, path, fact(nParts, rowsPerPart, sha), Seq("k"), "d")
        for (mode <- Seq("indexed", "noindex")) {
          if (mode == "noindex") {
            val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
            fs.delete(new org.apache.hadoop.fs.Path(path + "/_keyidx"), true)
          }
          val s = timedMerge(path, sha)
          println(f"PROBE shape=$shape%-4s parts=$nParts%4d mode=$mode%-8s merge=$s%.2f s")
        }
      } finally graft.sources.LocalFs.deleteRecursively(work)
    }

    // maintenance curve: same 50-key single-partition batch, N up to
    // 4096 (the 100 TB daily-partitioned regime), always indexed —
    // isolates per-merge index upkeep + probe, which must not grow
    // O(N). Fewer rows per partition: the point is partition COUNT.
    for (nParts <- Seq(512, 2048, 4096)) {
      val work = graft.sources.LocalFs.scratchDir("graft_probe_maint")
      try {
        val path = s"$work/fact"
        Upsert.mergePartitionedPath(spark, path, fact(nParts, 20000, sha = true), Seq("k"), "d")
        val s1 = timedMerge(path, sha = true)
        val s2 = timedMerge(path, sha = true)
        println(f"MAINT parts=$nParts%4d merge1=$s1%.2f s merge2=$s2%.2f s")
      } finally graft.sources.LocalFs.deleteRecursively(work)
    }
  }
}
