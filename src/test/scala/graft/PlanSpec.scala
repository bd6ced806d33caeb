package graft

import graft.analytics.Queries
import org.apache.spark.sql.functions._

/** Physical-plan shape assertions — the 100 TB posture is only real if
  * the plans actually broadcast dims, push filters into the parquet
  * scan, and prune columns (SURVEY.md §4). */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1 fact-dim join is a broadcast hash join (no fact shuffle for the join)") {
    assert(plan(Queries.q1TopBrands(spark, dir)).contains("BroadcastHashJoin"))
  }

  test("q4 star join broadcasts all three dims") {
    val p = plan(Queries.q4GeoRollup(spark, dir))
    assert("BroadcastHashJoin".r.findAllIn(p).size == 3)
    assert(!p.contains("SortMergeJoin"))
  }

  test("filters push down to the parquet scan") {
    val df = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") > 30).select("l_orderkey")
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30"))
  }

  test("column pruning reaches the scan: 2-column projection reads 2 columns") {
    val df = Queries.q2DailyTrend(spark, dir)
    val scans = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val liScan = scans.find(_.contains("lineitem")).get
    // q2 needs only shipdate, extendedprice, quantity, orderkey
    assert(liScan.contains("ReadSchema"))
    assert(!liScan.contains("l_comment") && !liScan.contains("l_partkey"))
  }

  test("top-k queries plan TakeOrderedAndProject, not a global sort") {
    assert(plan(Queries.q1TopBrands(spark, dir)).contains("TakeOrderedAndProject"))
    assert(plan(Queries.q5RiskWatchlist(spark, dir)).contains("TakeOrderedAndProject"))
  }

  test("similarity paths broadcast the query/anchor side, never shuffle the corpus for it") {
    val emb = Tables.embeddings(spark, dir)
    val p = plan(graft.operators.Similarity.bruteForceTopK(
      emb, emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5), k = 3))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
  }

  test("dedup_embedding never plans an all-pairs join: no nested-loop or cartesian anywhere") {
    val p = plan(graft.analytics.DataOps.dedupEmbedding(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
    // candidate generation is the native signature kernel; verification
    // scores with the codegen'd dot kernel
    assert(p.contains("graft_hyperplane_keys") && p.contains("graft_dot"))
  }

  test("lshTopK buckets with the native kernels, not the interpreted HOF fold") {
    val emb = Tables.embeddings(spark, dir)
    val p = plan(graft.operators.Similarity.lshTopK(
      emb, emb.filter(col("vec_id") < 5), k = 3, nPlanes = 3))
    assert(p.contains("graft_hyperplane_keys") && p.contains("graft_dot"))
    assert(!p.contains("aggregate(zip_with"))
    // literal planes: bucketing is map-side — no join or shuffle feeds it
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("rollup plans one Expand + one aggregate pass, not a union of re-scans") {
    val p = plan(Queries.aggRollupTotals(spark, dir))
    assert(p.contains("Expand"))
    assert("Scan parquet".r.findAllIn(p).size == 3) // customer + nation + region, once each
    assert(!p.contains("Union"))
  }

  test("date-partitioned fact read prunes partitions at plan time") {
    val df = graft.analytics.PipelineOps.s13FactPrune(spark, dir)
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("graft_fact_events")).get
    assert(scan.contains("PartitionFilters: [isnotnull(event_date"))
    // the week filter is a partition predicate, not a data filter
    assert(scan.contains("event_date") && !scan.contains("PartitionFilters: []"))
  }

  test("temporal joins never plan nested-loop or cartesian work") {
    // as-of: merge-sorted union + window — no join operator at all
    val pAsof = plan(graft.analytics.DataOps.asofAttribution(spark, dir))
    assert(!pAsof.contains("BroadcastNestedLoopJoin") && !pAsof.contains("CartesianProduct"))
    assert(pAsof.contains("Window"))
    // range: equi-join on (key, bucket); the BETWEEN runs as a filter/condition,
    // not as a nested-loop join
    val pRange = plan(graft.analytics.DataOps.rangeViewsBeforePurchase(spark, dir))
    assert(!pRange.contains("BroadcastNestedLoopJoin") && !pRange.contains("CartesianProduct"))
    assert(pRange.contains("Join") || pRange.contains("join"))
  }

  test("documents scan prunes to the referenced columns only") {
    val df = graft.analytics.DataOps.textFingerprint(spark, dir)
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("documents")).get
    assert(scan.contains("ReadSchema"))
    assert(!scan.contains("lang")) // fingerprint needs doc_id + text only
  }

  test("curation text ops stay relational: no cartesian/nested-loop, redaction is map-side") {
    // repetition + passage dedup: every join is an equi-join
    val pRep = plan(graft.analytics.DataOps.textRepetition(spark, dir))
    assert(!pRep.contains("BroadcastNestedLoopJoin") && !pRep.contains("CartesianProduct"))
    val pPass = plan(graft.analytics.DataOps.passageDup(spark, dir))
    assert(!pPass.contains("BroadcastNestedLoopJoin") && !pPass.contains("CartesianProduct"))
    // boilerplate top-k cuts with TakeOrderedAndProject, not a global sort
    assert(plan(graft.analytics.DataOps.boilerplateTopk(spark, dir))
      .contains("TakeOrderedAndProject"))
    // the scrub itself is a projection: the only exchange in text_redact
    // feeds the per-language rollup, nothing shuffles full documents
    val pRed = plan(graft.analytics.DataOps.textRedact(spark, dir))
    assert(!pRed.contains("Join"))
  }

  test("corpus-prep ops keep their 100 TB shapes: broadcast bench index, fused quantize kernel, one shard shuffle") {
    // contamination: the benchmark n-gram index broadcasts; the corpus
    // side never shuffles before the collision rollup
    val pC = plan(graft.analytics.CorpusOps.contamPairs(spark, dir))
    assert(pC.contains("BroadcastHashJoin"))
    assert(!pC.contains("SortMergeJoin") && !pC.contains("CartesianProduct"))
    // quantized similarity: native kernels only — no interpreted HOF
    // fold survives into the plan — and the query side broadcasts
    val pQ = plan(graft.analytics.CorpusOps.simTopKQ8(spark, dir))
    assert(pQ.contains("graft_q8") && pQ.contains("graft_dot"))
    assert(!pQ.contains("aggregate(zip_with") && !pQ.contains("transform("))
    assert(pQ.contains("BroadcastNestedLoopJoin") || pQ.contains("BroadcastExchange"))
    // bm25: the probe-term filter lands before the tf shuffle and the
    // k cut is TakeOrderedAndProject
    val pB = plan(graft.analytics.CorpusOps.bm25Probe(spark, dir))
    assert(pB.contains("TakeOrderedAndProject"))
    assert(!pB.contains("SortMergeJoin"))
    // shard plan: position window and per-shard rollup share ONE
    // hash-partitioning on shard — exactly one exchange in the plan
    val pS = plan(graft.analytics.CorpusOps.shardPlan(spark, dir))
    assert("Exchange hashpartitioning".r.findAllIn(pS).size == 1, pS)
  }

  test("stock pipeline keeps the reference plans' 100 TB shapes: broadcast dim, TakeOrdered top-k, keyed windows") {
    import graft.pipeline.StockCatalog
    // fct ⋈ dim is a broadcast hash join — the dim is entity-sized at
    // any fact scale — and Q1's top-10 is TakeOrderedAndProject
    val q1 = plan(StockCatalog.stockQ1(spark, dir))
    assert(q1.contains("BroadcastHashJoin"))
    assert(!q1.contains("SortMergeJoin"))
    assert(q1.contains("TakeOrderedAndProject"))
    // U1's parameterized top-k likewise never global-sorts
    assert(plan(StockCatalog.stockU1(spark, dir)).contains("TakeOrderedAndProject"))
    // Q5's trailing window partitions by entity (high-cardinality at
    // scale) — no empty-partition-spec global window anywhere
    val q5 = plan(StockCatalog.stockQ5(spark, dir))
    assert(!q5.contains("Window [") || !q5.contains("partitionBy=[]"))
    // U2's global stats are a 1-row aggregate broadcast, never a window
    val u2 = plan(StockCatalog.stockU2(spark, dir))
    assert(u2.contains("BroadcastNestedLoopJoin") || u2.contains("BroadcastExchange"))
  }

  test("global stats never use a global window: q3/u2 plan a 1-row aggregate + broadcast") {
    val p3 = plan(Queries.q3ZScoreOutliers(spark, dir))
    assert(!p3.contains("Window") && p3.contains("BroadcastNestedLoopJoin"))
    val pu2 = plan(graft.analytics.AppOps.u2ActivityShocks(spark, dir))
    assert(!pu2.contains("Window"))
  }

  test("KMV sketch min-k cut is TakeOrderedAndProject over a partial-agg distinct, no global sort") {
    val p = plan(graft.analytics.DataOps.kmvDistinctEvents(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p)
    // the distinct reduction must partial-aggregate map-side before its
    // exchange (the O(distinct)-not-O(corpus) shuffle property)
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct"))
  }

  test("full-outer reconciliation: rollups shuffle once each and the join reuses their partitioning") {
    val df = graft.analytics.PipelineOps.reconOrdersEvents(spark, dir)
    val p = plan(df)
    assert(p.contains("FullOuter"), p.take(3000))
    // 2 rollup exchanges + 1 final presence-agg exchange; a 4th would
    // mean the outer join re-shuffled the already-partitioned rollups
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 3, s"expected <= 3 exchanges, got $exchanges\n${p.take(3000)}")
  }

  test("LM surprisal: vocab side broadcasts, per-doc reduce partial-aggregates, no cartesian") {
    val p = plan(graft.analytics.DataOps.lmSurprisal(spark, dir))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // the unigram/vocab frames ride a broadcast, the corpus is never
    // shuffled for them; the doc-level sum partial-aggregates map-side
    assert(p.contains("BroadcastExchange"), p.take(3000))
    assert(p.contains("partial_sum") || p.contains("partial_count"), p.take(3000))
  }

  test("LM backoff and CMS join-size keep relational shapes: no cartesian, partial aggregation") {
    val pb = plan(graft.analytics.DataOps.lmBackoff(spark, dir))
    assert(!pb.contains("CartesianProduct"), pb.take(3000))
    assert(pb.contains("partial_sum") || pb.contains("partial_count"), pb.take(3000))
    val pc = plan(graft.analytics.DataOps.cmsJoinSizeOrdersEvents(spark, dir))
    assert(!pc.contains("CartesianProduct"), pc.take(3000))
    // both counter tables are partial-agg reductions before their join
    assert(pc.contains("partial_count"), pc.take(3000))
  }

  test("span dedup: semi-join marks duplicated grams, no cartesian, gram df partial-aggregates") {
    val p = plan(graft.analytics.DataOps.spanDupSpans(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    // the duplicated-gram probe is a semi join (positions never fan out
    // per duplicate); under the key budget the build side is the
    // bounded LOCAL key relation (the dup aggregate — with its
    // partial-aggregated df counts — runs in the one bounded key-fetch
    // job, no cached frame left behind), so the gram stream's second
    // pass stays map-side
    assert(p.contains("LeftSemi"), p.take(3000))
    assert(p.contains("LocalTableScan"), p.take(3000))
    // interval merge runs per doc, not in one global window
    assert(!p.contains("Window [") || !p.contains("SinglePartition"), p.take(3000))
  }

  test("classifier scoring is map-side: no exchange, no window, stays in whole-stage codegen") {
    import org.apache.spark.sql.functions.col
    val feats = Tables.documents(spark, dir).select(
      graft.operators.TextAnalysis.lengthScore(col("text")).as("x1"),
      graft.operators.TextAnalysis.stopwordScore(col("text")).as("x2"))
    val p = plan(graft.operators.Classifier.score(
      feats, Seq(col("x1"), col("x2")), Array(0.1, 0.2, 0.3)))
    assert(!p.contains("Exchange"), p.take(3000))
    assert(!p.contains("Window ["), p.take(3000))
    assert(p.contains("*("), p.take(3000)) // whole-stage-codegen stage marks
  }

  test("gapfill: spine bounds partial-aggregate; LOCF window is keyed, never SinglePartition") {
    val p = plan(graft.analytics.DataOps.gapfillDaily(spark, dir))
    assert(p.contains("partial_min") || p.contains("partial_max"), p.take(3000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    // the LOCF window hashes on the series keys
    assert(!p.contains("Window [") || !p.contains("SinglePartition"), p.take(3000))
  }

  test("fuzzy link: hash join on the block key with both pair-pruning predicates pushed") {
    val p = plan(graft.analytics.DataOps.fuzzyPairsCustomers(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    // id ordering and the length band are join-condition/filter predicates,
    // evaluated before the bounded levenshtein
    assert(p.contains("levenshtein"), p.take(3000))
  }
}
