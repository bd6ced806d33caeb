package graft.analytics

import graft.{SparkSpec, Tables}
import graft.operators.KMeans
import org.apache.spark.sql.functions._

/** Pins the streaming-IVF-ingest gate's two load-bearing claims
  * beyond the DuckDB rollup hash: (1) the settled index equals the
  * BATCH rebuild (stream machinery — chunked source, watermarked
  * dedup, replayed chunk, foreachBatch append — is result-invisible),
  * and (2) the index is physically CELL-PARTITIONED, i.e. the layout
  * a probe prunes on actually exists on disk with the right row
  * counts per cell directory. */
class StreamAnnIngestSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("settled streaming index == batch assignment, and the layout is cell-partitioned") {
    val (out, work) = DataOps.streamAnnIngestKeep(spark, dir)
    try {
      val got = out.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq

      // batch twin: same frozen training, same assignment, no stream
      val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
      val cents = KMeans.fit(emb, k = 8, nIter = 2)
      val expected = KMeans.assignCells(emb, cents)
        .select(col("cell").cast("long").as("cell"), col("vec_id"),
          graft.functions.Cols.r(col("cell_cos"), 6).as("rcos"))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n_vectors"),
          sum(col("vec_id")).cast("long").as("sum_vec_id"),
          graft.functions.Cols.r(graft.functions.Cols.avgExact(col("rcos"), 6), 6).as("avg_cos"))
        .orderBy(col("cell").asc)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      assert(got == expected)
      assert(got.map(_._2).sum == emb.count(), "every vector lands in exactly one cell")

      // physical layout: one cell=<id> partition directory per cell,
      // holding exactly that cell's rows — the pruning surface a
      // probe's `WHERE cell = ?` filter uses
      val target = new java.io.File(s"$work/target")
      val cellDirs = target.listFiles().filter(_.isDirectory)
        .map(_.getName).filter(_.startsWith("cell=")).sorted
      assert(cellDirs.length == got.length,
        s"expected ${got.length} cell partitions, found ${cellDirs.mkString(", ")}")
      got.foreach { case (cell, n, _, _) =>
        val rows = spark.read.parquet(s"$work/target/cell=$cell").count()
        assert(rows == n, s"cell=$cell directory holds $rows rows, rollup says $n")
      }
    } finally graft.sources.LocalFs.deleteRecursively(work)
  }
}
