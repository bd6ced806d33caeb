package graft

import graft.analytics.{SpectrumOps, TokenizerOps}

/** The trained-artifact memos: every bpe_* entry shares ONE training
  * run per corpus and every embed_pca/abtt entry shares ONE moment
  * pass — repeat catalog sweeps (the bench's cold+warm passes) must
  * not re-train (the DataOpsCountMemoSpec contract, extended to the
  * r7 trainers). */
class TrainMemoSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("BPE trains once per corpus across all three entries and repeats") {
    val before = TokenizerOps.bpeTrainRuns.get()
    TokenizerOps.bpeMerges(spark, dir).collect()
    TokenizerOps.bpeVocab(spark, dir).collect()
    TokenizerOps.bpeSubtokenStats(spark, dir).collect()
    TokenizerOps.bpeMerges(spark, dir).collect()
    val runs = TokenizerOps.bpeTrainRuns.get() - before
    assert(runs <= 1, s"expected at most one training run, saw $runs")
  }

  test("PQ trains once per corpus across all five m=4 entries and repeats") {
    import graft.analytics.DataOps
    val before = DataOps.pqTrainRuns.get()
    DataOps.simTopKPq(spark, dir).collect()
    DataOps.pqDistortion(spark, dir).collect()
    DataOps.pqRecall(spark, dir).collect()
    DataOps.simTopKIvfadc(spark, dir).collect()
    DataOps.ivfadcRecall(spark, dir).collect()
    DataOps.simTopKPq(spark, dir).collect()
    val runs = DataOps.pqTrainRuns.get() - before
    assert(runs <= 1, s"expected at most one PQ training run, saw $runs")
  }

  test("production-geometry PQ (8x256) trains once per corpus across both entries and repeats") {
    import graft.analytics.DataOps
    val before = DataOps.pq256TrainRuns.get()
    DataOps.simTopKPq256(spark, dir).collect()
    DataOps.pq256Recall(spark, dir).collect()
    DataOps.ivfadc256Recall(spark, dir).collect()
    DataOps.simTopKPq256(spark, dir).collect()
    val runs = DataOps.pq256TrainRuns.get() - before
    assert(runs <= 1, s"expected at most one PQ8x256 training run, saw $runs")
  }

  test("production-DIMENSION PQ (32x256 at 256-d) trains once per corpus across both d256 entries and repeats") {
    import graft.analytics.DataOps
    val before = DataOps.pqD256TrainRuns.get()
    DataOps.pqRecallD256(spark, dir).collect()
    DataOps.ivfadcRecallD256(spark, dir).collect()
    DataOps.pqRecallD256(spark, dir).collect()
    val runs = DataOps.pqD256TrainRuns.get() - before
    assert(runs <= 1, s"expected at most one PQ32x256 training run, saw $runs")
  }

  test("PCA fits once per corpus across both entries and repeats") {
    val before = SpectrumOps.pcaFitRuns.get()
    SpectrumOps.embedPcaTop(spark, dir).collect()
    SpectrumOps.embedAbttLabels(spark, dir).collect()
    SpectrumOps.embedPcaTop(spark, dir).collect()
    val runs = SpectrumOps.pcaFitRuns.get() - before
    assert(runs <= 1, s"expected at most one fit, saw $runs")
  }
}
