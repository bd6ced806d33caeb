package graft.analytics

import graft.{SparkSpec, Tables}

/** Pins verdict item "single-count, memoized dispatch": across every
  * `dedup_embedding*` / `semdedup_prune` entry and repeat catalog
  * calls, the per-corpus vector count runs as ONE count job total —
  * repeat calls read the memoized long. The counter counts actual
  * `count()` executions inside the memo, so any regression that
  * re-introduces a per-entry scan fails the delta assertion. */
class DataOpsCountMemoSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("one count job per corpus across all embedding-dedup entries and repeats") {
    val emb = Tables.embeddings(spark, dir)
    DataOps.embCount(emb, dir) // ensure the memo is primed (≤1 job)
    val before = DataOps.embCountJobs.get()
    DataOps.embPairGraphAdaptive(emb, dir).count()
    DataOps.dedupEmbedding(spark, dir).count()
    DataOps.dedupEmbeddingGroups(spark, dir).count()
    DataOps.dedupEmbeddingIvf(spark, dir).count()
    DataOps.semdedupPrune(spark, dir).count()
    DataOps.dedupEmbedding(spark, dir).count() // repeat catalog call
    assert(DataOps.embCountJobs.get() == before,
      "embedding corpus count re-ran despite the memo")
    assert(DataOps.embCount(emb, dir) == emb.count()) // memo holds the true count
  }

  test("one events-count job per corpus across stream_join_views dispatch and repeats") {
    import org.apache.spark.sql.functions.col
    val ev = Tables.events(spark, dir).filter(col("ts").isNotNull)
    DataOps.evCount(ev, dir) // prime (≤1 job)
    val before = DataOps.evCountJobs.get()
    DataOps.streamJoinViews(spark, dir).count()
    DataOps.streamJoinViews(spark, dir).count() // repeat catalog call
    assert(DataOps.evCountJobs.get() == before,
      "events dispatch count re-ran despite the memo")
    assert(DataOps.evCount(ev, dir) == ev.count()) // memo holds the true count
  }
}
