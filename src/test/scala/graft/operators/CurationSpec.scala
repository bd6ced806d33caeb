package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("keeperFilter keeps the min id per cluster and every singleton") {
    val docs = (1L to 10L).map(i => (i, s"doc $i", "en")).toDF("doc_id", "text", "lang")
    // clusters {1,2,3} and {7,8}; 4,5,6,9,10 singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("doc_a", "doc_b")
    val kept = Curation.keeperFilter(docs, pairs).select($"doc_id")
      .as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 5L, 6L, 7L, 9L, 10L))
  }

  test("keeperFilterBest keeps each cluster's highest-quality member, not the min id") {
    val docs = Seq(
      (1L, 0.5), (2L, 0.9), (3L, 0.7), // cluster {1,2,3}: keeper = 2 (best quality)
      (7L, 0.4), (8L, 0.4),            // cluster {7,8}: quality tie → id tiebreak = 7
      (4L, 0.1), (9L, 0.2)             // singletons survive regardless of quality
    ).toDF("doc_id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("doc_a", "doc_b")
    val kept = Curation.keeperFilterBest(docs, pairs,
        Seq($"quality".desc, $"doc_id".asc))
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 7L, 4L, 9L))
    // the min-id keeper disagrees on cluster {1,2,3} — the two rules
    // are genuinely different policies
    val minId = Curation.keeperFilter(docs, pairs)
      .select($"doc_id").as[Long].collect().toSet
    assert(minId == Set(1L, 7L, 4L, 9L))
  }

  test("tokenBudget keeps best-first rows while the inclusive running total fits") {
    val docs = Seq(
      // lang, doc_id, tokens, quality
      ("en", 1L, 40L, 1.0), ("en", 2L, 50L, 0.9), ("en", 3L, 30L, 0.8), ("en", 4L, 10L, 0.7),
      ("de", 5L, 90L, 0.5), ("de", 6L, 20L, 0.9)
    ).toDF("lang", "doc_id", "nt", "q")
    val out = Curation.tokenBudget(docs, "lang", $"nt",
        Seq($"q".desc, $"doc_id".asc), budget = 100L)
      .select($"doc_id").as[Long].collect().toSet
    // en: 40 (cum 40), 50 (90), 30 would hit 120 > 100 -> stop; 10 (cum 130) also out
    // de: best-first 20 (cum 20), then 90 would hit 110 -> out
    assert(out == Set(1L, 2L, 6L))
  }

  test("tokenBudget boundary: a row landing exactly on the budget is kept") {
    val docs = Seq(("en", 1L, 60L, 1.0), ("en", 2L, 40L, 0.9), ("en", 3L, 1L, 0.8))
      .toDF("lang", "doc_id", "nt", "q")
    val out = Curation.tokenBudget(docs, "lang", $"nt",
        Seq($"q".desc, $"doc_id".asc), budget = 100L)
      .select($"doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L)) // 60, 100 (== budget, kept), 101 (out)
  }

  test("hashSample is deterministic, monotone in rate, and honors the default") {
    val docs = (0L until 1000L).map(i => (i, if (i % 2 == 0) "en" else "xx"))
      .toDF("doc_id", "lang")
    def sample(rates: Map[String, Int], default: Int): Set[Long] =
      Curation.hashSample(docs, "doc_id", "lang", rates, default)
        .select($"doc_id").as[Long].collect().toSet
    val a = sample(Map("en" -> 30), 0)
    val b = sample(Map("en" -> 30), 0)
    assert(a == b)                          // reproducible
    assert(a.forall(_ % 2 == 0))            // default 0: no 'xx' rows
    val wider = sample(Map("en" -> 60), 0)
    assert(a.subsetOf(wider))               // raising the rate only adds rows
    // rate approximates the fraction (multiplicative hash scatters well)
    assert(math.abs(a.size / 500.0 - 0.30) < 0.08)
    val withDefault = sample(Map("en" -> 0), 50)
    assert(withDefault.forall(_ % 2 == 1))  // only 'xx' via the default rate
    assert(withDefault.nonEmpty)
  }

  // 900 'big' docs vs 100 'small' docs
  private def skewed = (0L until 1000L)
    .map(i => (i, if (i < 900) "big" else "small")).toDF("doc_id", "source")

  test("temperatureMix upweights the rare stratum relative to its natural share") {
    val kept = Curation.temperatureMix(skewed, "source", "doc_id",
        alpha = 0.5, targetFrac = 0.3)
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    val keepFracBig = kept.getOrElse("big", 0L).toDouble / 900
    val keepFracSmall = kept.getOrElse("small", 0L).toDouble / 100
    assert(keepFracSmall > keepFracBig,
      s"rare stratum must keep a larger fraction: small=$keepFracSmall big=$keepFracBig")
    // still roughly on target overall (hash scatter is approximate)
    val total = kept.values.sum
    assert(total > 200 && total < 400, s"expected ~300 kept, got $total")
  }

  test("temperatureMix at alpha=1 degenerates to uniform rates (proportional sampling)") {
    val rates = Curation.temperatureMix(skewed, "source", "doc_id",
        alpha = 1.0, targetFrac = 0.5)
      .select($"source", $"rate_pm").distinct().as[(String, Long)].collect().toMap
    // w_i*T/c_i == T/N for every stratum when alpha=1
    assert(rates.values.toSet.size == 1, s"rates must be equal, got $rates")
  }

  test("temperatureMix is deterministic") {
    def run() = Curation.temperatureMix(skewed, "source", "doc_id")
      .select($"doc_id").as[Long].collect().toSet
    assert(run() == run())
  }

  // -------- priority sampling (Duffield–Lund–Thorup) ------------------

  private def weighted = (1L to 500L).map(i => (i, (i % 37 + 1).toDouble)).toDF("doc_id", "w")

  test("prioritySample keeps exactly the k largest priorities with tau = the (k+1)-th") {
    val k = 25
    val got = Curation.prioritySample(weighted, "doc_id", $"w", k)
      .select($"doc_id", $"priority", $"tau", $"w_hat")
      .as[(Long, Double, Double, Double)].collect()
    assert(got.length == k)
    // replicate the arithmetic locally
    val P = 1000000007L
    val m = 1 << 20
    val all = (1L to 500L).map { i =>
      val w = (i % 37 + 1).toDouble
      val bucket = ((i * 2654435761L) % P) % m
      (i, w, w * m / (bucket + 1).toDouble)
    }.sortBy { case (id, _, q) => (-q, id) }
    val expTau = all(k)._3
    val expIds = all.take(k).map(_._1).toSet
    assert(got.map(_._1).toSet == expIds)
    got.foreach { case (id, q, t, wh) =>
      assert(t == expTau, s"tau $t != $expTau")
      assert(q >= t, s"kept priority $q below tau")
      val w = (id % 37 + 1).toDouble
      assert(wh == math.max(w, expTau), s"w_hat $wh for id $id")
    }
  }

  test("prioritySample with k >= population keeps everything with tau = 0 and w_hat = w") {
    val small = (1L to 10L).map(i => (i, i.toDouble)).toDF("doc_id", "w")
    val got = Curation.prioritySample(small, "doc_id", $"w", k = 50)
      .select($"doc_id", $"tau", $"w_hat").as[(Long, Double, Double)].collect()
    assert(got.length == 10)
    got.foreach { case (id, t, wh) => assert(t == 0.0 && wh == id.toDouble) }
  }

  test("prioritySample drops non-positive and NULL weights, is deterministic, and validates k") {
    val df = Seq((1L, Some(5.0)), (2L, Some(0.0)), (3L, Some(-1.0)), (4L, None), (5L, Some(2.0)))
      .toDF("doc_id", "w")
    def run() = Curation.prioritySample(df, "doc_id", $"w", k = 10)
      .select($"doc_id").as[Long].collect().toSet
    assert(run() == Set(1L, 5L))
    assert(run() == run())
    intercept[IllegalArgumentException](
      Curation.prioritySample(df, "doc_id", $"w", k = 0))
    intercept[IllegalArgumentException](
      Curation.prioritySample(df, "doc_id", $"w", k = 1, modulus = 1000)) // not a power of two
  }

  test("prioritySample subset-sum estimator: mean of sum(w_hat) over disjoint id spaces tracks sum(w)") {
    // unbiasedness is over the u draw; emulate independent draws by
    // shifting the id space (each shift scatters to fresh hash buckets)
    val trials = (0 until 8).map { s =>
      val df = (1L to 300L).map(i => (i + s * 1000000L, (i % 23 + 1).toDouble))
        .toDF("doc_id", "w")
      val est = Curation.prioritySample(df, "doc_id", $"w", k = 60)
        .agg(sum($"w_hat")).as[Double].head()
      val truth = (1L to 300L).map(i => (i % 23 + 1).toDouble).sum
      est / truth
    }
    val mean = trials.sum / trials.size
    assert(mean > 0.85 && mean < 1.15, s"estimator ratio mean $mean, trials $trials")
  }

  test("prioritySampleByGroup: k per group, per-group tau, single-group case equals global sampler") {
    val df = (1L to 400L).map(i => (i, s"g${i % 4}", (i % 13 + 1).toDouble))
      .toDF("doc_id", "grp", "w")
    val k = 8
    val got = Curation.prioritySampleByGroup(df, "doc_id", "grp", $"w", k)
      .select($"grp", $"doc_id", $"priority", $"tau", $"w_hat")
      .as[(String, Long, Double, Double, Double)].collect()
    val byGrp = got.groupBy(_._1)
    assert(byGrp.keySet == Set("g0", "g1", "g2", "g3"))
    byGrp.foreach { case (g, rows) =>
      assert(rows.length == k, s"$g kept ${rows.length}")
      // local replay of the group's priorities
      val P = 1000000007L; val m = 1 << 20
      val all = (1L to 400L).filter(i => s"g${i % 4}" == g).map { i =>
        val w = (i % 13 + 1).toDouble
        (i, w, w * m / ((((i * 2654435761L) % P) % m) + 1).toDouble)
      }.sortBy { case (id, _, q) => (-q, id) }
      val expTau = all(k)._3
      assert(rows.map(_._2).toSet == all.take(k).map(_._1).toSet, s"$g kept set")
      rows.foreach { case (_, id, q, t, wh) =>
        assert(t == expTau && q >= t)
        assert(wh == math.max((id % 13 + 1).toDouble, expTau))
      }
    }
    // one group ⇒ identical to the global sampler
    val one = (1L to 100L).map(i => (i, "only", (i % 7 + 1).toDouble))
      .toDF("doc_id", "grp", "w")
    val grouped = Curation.prioritySampleByGroup(one, "doc_id", "grp", $"w", 5)
      .select($"doc_id", $"w_hat").as[(Long, Double)].collect().toSet
    val global = Curation.prioritySample(one.drop("grp"), "doc_id", $"w", 5)
      .select($"doc_id", $"w_hat").as[(Long, Double)].collect().toSet
    assert(grouped == global)
  }

  test("prioritySample plan: top-k is TakeOrderedAndProject, no global Sort over the corpus") {
    val p = Curation.prioritySample(weighted, "doc_id", $"w", k = 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("temperatureMix validates its parameters") {
    intercept[IllegalArgumentException](
      Curation.temperatureMix(skewed, "source", "doc_id", alpha = 0.0))
    intercept[IllegalArgumentException](
      Curation.temperatureMix(skewed, "source", "doc_id", targetFrac = 0.0))
    intercept[IllegalArgumentException](
      Curation.temperatureMix(skewed, "source", "doc_id", targetFrac = 1.5))
  }

  test("assignSplits is disjoint, exhaustive, and stable under corpus growth") {
    val docs = (0L until 500L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val split = Curation.assignSplits(docs, "doc_id",
      Seq(("train", 80), ("val", 90)), "test")
    // every row gets exactly one label from the declared set
    val labels = split.select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(labels.size == 500 && labels.values.toSet == Set("train", "val", "test"))
    // roughly 80/10/10 (multiplicative-hash scatter, not exact)
    val n = labels.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(n("train") > 300 && n("val") > 10 && n("test") > 10)
    // growth stability: the same doc keeps its split in a larger corpus
    val grown = (0L until 1000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val labels2 = Curation.assignSplits(grown, "doc_id",
        Seq(("train", 80), ("val", 90)), "test")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    labels.foreach { case (id, l) => assert(labels2(id) == l) }
  }

  test("assignSplits flags NULL ids with a NULL label and validates cuts") {
    val docs = Seq(Some(1L), None).map(i => (i, "x")).toDF("doc_id", "text")
    val got = Curation.assignSplits(docs, "doc_id", Seq(("a", 50)), "b")
      .select($"doc_id", $"split").as[(Option[Long], Option[String])].collect().toSet
    assert(got.exists { case (id, s) => id.isEmpty && s.isEmpty })
    assert(got.exists { case (id, s) => id.nonEmpty && s.nonEmpty })
    intercept[IllegalArgumentException](
      Curation.assignSplits(docs, "doc_id", Seq.empty, "z"))
    intercept[IllegalArgumentException](
      Curation.assignSplits(docs, "doc_id", Seq(("a", 90), ("b", 50)), "z"))
    intercept[IllegalArgumentException](
      Curation.assignSplits(docs, "doc_id", Seq(("a", 120)), "z"))
  }
}
