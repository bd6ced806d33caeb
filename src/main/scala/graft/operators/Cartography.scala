package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-cartography QA operators: corpus-level profiles that tell
  * a curation pipeline WHERE its data is unusual before any filter
  * fires — the complement of the keep/drop operators (Curation,
  * TextDedup) which act on what these measure.
  *
  * Not part of the reference's surface (its QA layer is row-count
  * validation, /root/reference/sql/02_load_data.sql:60-75) — these
  * are SURVEY.md §7.4 north-star extensions over the harness
  * `documents` / `embeddings` tables.
  *
  * Two profiles:
  *  - [[rarityProfile]]: per-source histogram of document n-gram
  *    rarity — the share of a doc's distinct shingles that appear in
  *    NO other document (df = 1). High-rarity docs are novel (or
  *    noise); zero-rarity docs are templated/boilerplate. The exact
  *    opposite tail of Passages.boilerplateTopK, over the same
  *    inverted index shape.
  *  - [[labelCentroids]]: per-label embedding cohesion — each
  *    label's centroid norm and the mean cosine of members to their
  *    own centroid. Collapsed or incoherent label clusters surface
  *    as outlier rows (SemDeDup/dataset-cartography style QA over
  *    the vector column).
  *
  * Scale shape (both): every step is a partial-agg-friendly keyed
  * shuffle — shingle df / (label, dim) sums combine map-side; the
  * join back fans each exploded row exactly once; no driver-side
  * state, no collect. Bounded output: O(sources × 11 buckets) and
  * O(labels) rows.
  *
  * Oracle parity: all sums that cross engines are exact integer
  * arithmetic — shingle counts are longs, embedding components are
  * quantized to 1e-6 micro-ints BEFORE any aggregation (long / ≤26
  * digit decimal sums, order-independent), and doubles appear only
  * in final per-row cosine/ln steps that are micro-quantized
  * immediately (the Relevance contract).
  */
object Cartography {

  /** Per-(source, rarity-decile) rollup of document shingle rarity.
    * A doc's rarity is `n_unique * 1000 div n_sh` per-mille, where
    * n_unique counts its distinct word-`n`-gram shingles with global
    * document frequency 1; bucket = rarity div 100 (0..10). Docs
    * with fewer than `n` tokens have no shingles and are excluded
    * (same rule as every shingle-family operator here).
    * Output: (source, bucket, n_docs, sum_sh, sum_unique), ordered.
    * The summed shingle counts (exact longs) make the hash gate pin
    * the whole inverted index, not just the bucket census. */
  def rarityProfile(docs: DataFrame, n: Int = 3): DataFrame = {
    val sh = TextDedup.withShingleHashes(docs, n)
      .select(col("doc_id"), col("source"), explode(col("shingle_hashes")).as("sh"))
    val df_ = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    sh.join(df_, "sh")
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("df") === 1, lit(1L)).otherwise(lit(0L))).as("n_unique"))
      .withColumn("bucket", expr("CAST((n_unique * 1000 DIV n_sh) DIV 100 AS BIGINT)"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_sh")).as("sum_sh"),
        sum(col("n_unique")).as("sum_unique"))
      .orderBy(col("source").asc, col("bucket").asc)
  }

  /** Per-label embedding centroid + cohesion. Components are
    * quantized to micro-ints v = floor(x·1e6 + 0.5); the centroid is
    * the per-(label, dim) micro-sum s (n cancels out of every cosine,
    * so the division never happens in integer space). Per-member
    * cosine to the own-label centroid is
    * num / (√n2v · √n2s) with num = Σ v·s (≤26-digit decimal — s²
    * sums overflow int64 past ~50k vectors/label, so the products
    * are decimal(38,0) BY CONSTRUCTION, not by luck), n2v = Σ v²
    * (long). Output per label: n_vecs, centroid_norm_micro
    * (= √n2s / n, i.e. ‖centroid‖ in micro units) and cohesion_micro
    * (mean member cosine in micro units, floor(Σmc/n + 0.5) computed
    * in double so the negative-sum edge rounds identically on both
    * engines). */
  def labelCentroids(emb: DataFrame): DataFrame = {
    val ex = emb.filter(col("embedding").isNotNull && size(col("embedding")) > 0)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .withColumn("v", floor(col("x").cast("double") * lit(1e6) + lit(0.5)).cast("long"))
    val cent = ex.groupBy(col("label"), col("pos")).agg(sum(col("v")).as("s"))
    val labStats = cent.groupBy(col("label"))
      .agg(sum(col("s").cast("decimal(38,0)") * col("s").cast("decimal(38,0)")).as("n2s"))
    val rowdots = ex.join(cent, Seq("label", "pos"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(col("v").cast("decimal(38,0)") * col("s").cast("decimal(38,0)")).as("num"),
        sum(col("v") * col("v")).as("n2v"))
    val mcs = rowdots.join(labStats, "label")
      .withColumn("cos",
        when(col("n2v") > 0 && col("n2s") > 0,
          col("num").cast("double") /
            (sqrt(col("n2v").cast("double")) * sqrt(col("n2s").cast("double"))))
          .otherwise(lit(0.0)))
      .withColumn("mc", floor(col("cos") * lit(1e6) + lit(0.5)).cast("long"))
    mcs.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("mc")).as("sum_mc"), max(col("n2s")).as("n2s"))
      .select(col("label"), col("n_vecs"),
        floor(sqrt(col("n2s").cast("double")) / col("n_vecs") + lit(0.5))
          .cast("long").as("centroid_norm_micro"),
        floor(col("sum_mc").cast("double") / col("n_vecs") + lit(0.5))
          .cast("long").as("cohesion_micro"))
      .orderBy(col("label").asc)
  }

  /** Zipf power-law fit over the word-frequency head: Theil–Sen slope
    * (and intercept) of ln(freq) against ln(rank), over the top
    * `topRanks` words. Healthy natural-language corpora sit near
    * slope −1; a flat head signals templated text, a cliff signals a
    * truncated vocabulary — the corpus-level twin of the per-doc
    * type-token checks in TextAnalysis.
    *
    * Scale shape: the corpus aggregates ONCE to word counts (map-side
    * combinable), then a TakeOrdered cut bounds the frame at
    * `topRanks` rows — the O(R²) pairwise-slope join and the exact
    * rank-pick medians (the [[graft.analytics.StatsOps]]
    * trend_theil_sen machinery: row_number over a total order, no
    * percentile state) run on that bounded frame at any corpus size.
    *
    * Oracle parity: ln values are doubles, so every pairwise slope is
    * quantized to the 1e-6 grid BEFORE the median ordering — a
    * cross-engine ulp in libm's ln can no longer reorder the pick.
    * The intercept leg reuses the PICKED quantized slope (exact
    * micro/1e6 double on both engines) and quantizes residuals the
    * same way. Output: one row (n_ranks, n_pairs, slope_micro,
    * intercept_micro). */
  def zipfSlope(docs: DataFrame, topRanks: Int = 256): DataFrame = {
    require(topRanks >= 2 && topRanks <= 4096, "topRanks must be in [2, 4096]")
    val freqs = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w").asc)
      .limit(topRanks)
    // bounded frame from here on; pmod constant partition key states
    // the one-partition intent (the trend_theil_sen idiom)
    val wR = Window.partitionBy(pmod(length(col("w")), lit(1)))
      .orderBy(col("cnt").desc, col("w").asc)
    val pts = freqs.withColumn("rk", row_number().over(wR))
      .select(col("rk").cast("long").as("rk"),
        log(col("rk").cast("double")).as("x"),
        log(col("cnt").cast("double")).as("y"))
    val pairs = pts.select(col("rk").as("rk_a"), col("x").as("x_a"), col("y").as("y_a"))
      .join(pts.select(col("rk").as("rk_b"), col("x").as("x_b"), col("y").as("y_b")),
        col("rk_a") < col("rk_b"))
      .select(col("rk_a"), col("rk_b"),
        floor((col("y_b") - col("y_a")) / (col("x_b") - col("x_a")) * lit(1e6) + lit(0.5))
          .cast("long").as("slope_q"))
    val mFrame = pairs.agg(count(lit(1)).as("m"))
    val wS = Window.partitionBy(pmod(col("rk_a"), lit(1)))
      .orderBy(col("slope_q").asc, col("rk_a").asc, col("rk_b").asc)
    val slopeMed = pairs.withColumn("prk", row_number().over(wS))
      .crossJoin(broadcast(mFrame))
      .agg(min(when(col("prk") ===
          floor((col("m") + lit(1)).cast("double") / lit(2.0)).cast("long"), col("slope_q")))
        .as("slope_micro"), max(col("m")).as("n_pairs"))
    val nFrame = pts.agg(count(lit(1)).as("n_ranks"))
    val wI = Window.partitionBy(pmod(col("rk"), lit(1)))
      .orderBy(col("icept_q").asc, col("rk").asc)
    val iceptMed = pts.crossJoin(broadcast(slopeMed))
      .select(col("rk"),
        floor((col("y") - col("slope_micro").cast("double") / lit(1e6) * col("x"))
          * lit(1e6) + lit(0.5)).cast("long").as("icept_q"))
      .withColumn("prk", row_number().over(wI))
      .crossJoin(broadcast(nFrame))
      .agg(min(when(col("prk") ===
          floor((col("n_ranks") + lit(1)).cast("double") / lit(2.0)).cast("long"), col("icept_q")))
        .as("intercept_micro"))
    nFrame.crossJoin(broadcast(slopeMed)).crossJoin(broadcast(iceptMed))
      .select(col("n_ranks"), col("n_pairs"), col("slope_micro"), col("intercept_micro"))
  }

  /** Per-source histogram of document character entropy — the CCNet/
    * Gopher-family quality signal the ratio rules (TextAnalysis) do
    * not capture: binary-ish or single-character junk scores near 0
    * nats, templated text sits low, natural language clusters around
    * ~3 nats. H(doc) = −Σ_c p_c·ln p_c over the doc's character
    * distribution.
    *
    * Oracle parity: each character's term −p·ln p is quantized to the
    * 1e-9 grid PER (doc, char) row before the order-independent
    * integer sum (the ln-parity policy everywhere else); buckets are
    * 0.25-nat integer divisions of the nano-nat total. Scale shape:
    * one char explode (linear in corpus bytes), two doc-keyed partial
    * aggs, a bounded (source × buckets) rollup. */
  def charEntropyProfile(docs: DataFrame): DataFrame = {
    // the per-doc total is length(text) — carrying it through the
    // explode saves the totals groupBy + join-back (one shuffle).
    // split("") is the codegen'd char exploder (the transform(
    // sequence, substr) HOF form costs ~µs per char — the interpreted-
    // lambda trap); the empty-string guard strips any edge artifact
    // of the regex split, and real chars are never empty.
    val counts = docs
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id"), col("source"), length(col("text")).as("nt"),
        explode(split(col("text"), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy(col("doc_id"), col("source"), col("nt"), col("ch"))
      .agg(count(lit(1)).as("n"))
    val perdoc = counts
      .withColumn("p", col("n").cast("double") / col("nt").cast("double"))
      .withColumn("tq",
        floor(-(col("p") * log(col("p"))) * lit(1e9) + lit(0.5)).cast("long"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("tq")).as("h9"))
    perdoc
      .withColumn("bucket", expr("h9 DIV 250000000"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("h9")).as("sum_h9"))
      .orderBy(col("source").asc, col("bucket").asc)
  }

  /** Per-source distinct-n diversity (the NLG distinct-1/2/3 metric,
    * applied corpus-side): for n = 1..3, the share of DISTINCT token
    * n-grams among all n-gram instances. Templated/looped text shows
    * low distinct-2/3; healthy prose sits high. N-grams are built
    * with window leads over the exploded token stream (codegen'd —
    * no interpreted per-position lambda), so the cost is one
    * doc-keyed shuffle plus a (source, n)-bounded rollup.
    * Output: (source, n, n_total, n_distinct, ratio_micro). */
  def distinctNgramDiversity(docs: DataFrame): DataFrame = {
    val toks = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
    val led = toks
      .withColumn("w1", lead(col("w"), 1).over(wDoc))
      .withColumn("w2", lead(col("w"), 2).over(wDoc))
    val g1 = led.select(col("source"), lit(1L).as("n"), col("w").as("gram"))
    val g2 = led.filter(col("w1").isNotNull)
      .select(col("source"), lit(2L).as("n"),
        concat_ws(" ", col("w"), col("w1")).as("gram"))
    val g3 = led.filter(col("w2").isNotNull)
      .select(col("source"), lit(3L).as("n"),
        concat_ws(" ", col("w"), col("w1"), col("w2")).as("gram"))
    g1.unionByName(g2).unionByName(g3)
      .groupBy(col("source"), col("n"))
      .agg(count(lit(1)).as("n_total"), countDistinct(col("gram")).as("n_distinct"))
      .withColumn("ratio_micro",
        floor(col("n_distinct").cast("double") / col("n_total") * lit(1e6) + lit(0.5))
          .cast("long"))
      .orderBy(col("source").asc, col("n").asc)
  }

  /** Church–Gale burstiness: the variance-to-mean ratio of a word's
    * per-document count, zeros included — content words burst (a doc
    * that mentions them mentions them often ⇒ VMR ≫ 1), function
    * words spread evenly (VMR ≈ 1 − μ·(1−1/D) ≲ 1). Exact integer
    * per-(word, doc) counts and Σc/Σc² sums; the only doubles are the
    * final VMR = E[c²]/μ − μ, quantized per row before the top-k cut
    * (score desc, word asc). Corpus doc count D rides a 1-row
    * broadcast (the J2 pattern). Words in fewer than `minDf` docs are
    * excluded (a 1-doc word is trivially "bursty"). */
  def burstinessTopK(docs: DataFrame, k: Int = 20, minDf: Long = 5): DataFrame = {
    require(k >= 1 && k <= 1000, "k must be in [1, 1000]")
    val base = docs.filter(col("text").isNotNull)
    val dFrame = base.agg(count(lit(1)).as("d"))
    val perDoc = base
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    perDoc.groupBy(col("w"))
      .agg(count(lit(1)).as("df"), sum(col("c")).as("total"),
        sum(col("c") * col("c")).as("sumsq"))
      .filter(col("df") >= minDf)
      .crossJoin(broadcast(dFrame))
      .withColumn("mu", col("total").cast("double") / col("d").cast("double"))
      .withColumn("vmr_micro",
        floor((col("sumsq").cast("double") / col("d").cast("double") / col("mu")
          - col("mu")) * lit(1e6) + lit(0.5)).cast("long"))
      .select(col("w").as("word"), col("df"), col("total"), col("vmr_micro"))
      .orderBy(col("vmr_micro").desc, col("word").asc)
      .limit(k)
  }

  /** Per-source corpus mix — the governance table a training run's
    * data statement starts from: docs, tokens and chars per source,
    * token share, and the cumulative share in descending-token order
    * (read straight off: "the top k sources are X% of the corpus").
    * One corpus-scale aggregate; everything after runs on the
    * O(sources) frame (shares from a 1-row total via broadcast
    * crossJoin, the cumulative from a constant-partition window on
    * the bounded frame — the trend_theil_sen idiom). Integer token
    * counts cross engines; shares are micro-quantized per row. */
  def sourceMixSummary(docs: DataFrame): DataFrame = {
    val perSource = docs.filter(col("text").isNotNull)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(filter(split(col("text"), " "), w => w =!= ""))).as("n_tokens"),
        sum(length(col("text"))).as("n_chars"))
    val tot = perSource.agg(sum(col("n_tokens")).as("t_tokens"))
    val wCum = Window.partitionBy(pmod(col("n_docs"), lit(1)))
      .orderBy(col("n_tokens").desc, col("source").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perSource.crossJoin(broadcast(tot))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(wCum))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_chars"),
        floor(col("n_tokens").cast("double") / col("t_tokens") * lit(1e6) + lit(0.5))
          .cast("long").as("share_micro"),
        floor(col("cum_tokens").cast("double") / col("t_tokens") * lit(1e6) + lit(0.5))
          .cast("long").as("cum_share_micro"))
      .orderBy(col("n_tokens").desc, col("source").asc)
  }

  /** Per-source TF-IDF keywords: treat each source as one aggregate
    * document; score its terms by (1 + ln tf)·ln(S/df) with df = the
    * number of sources containing the term, and keep the top `k` per
    * source (score desc, term asc — ubiquitous terms score exactly 0
    * and lose every tiebreak to anything distinctive). The standard
    * corpus-card surface: what vocabulary distinguishes each slice.
    *
    * Scale shape: one corpus-scale (source, term) count (map-side
    * combinable), a term-keyed df rollup, a 1-row source-count frame
    * on a broadcast crossJoin (the J2 pattern), and a per-source
    * window top-k — the grouped twin of the QUALIFY rewrite. Scores
    * are micro-quantized per row BEFORE the rank window (the
    * [[Relevance]] contract), so libm ulps cannot reorder ranks.
    * Output: (source, rk, term, score_micro), k rows per source. */
  def keywordsPerSource(docs: DataFrame, k: Int = 3): DataFrame = {
    require(k >= 1 && k <= 100, "k must be in [1, 100]")
    val tf = docs.select(col("source"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val sFrame = tf.select(col("source")).distinct().agg(count(lit(1)).as("n_sources"))
    val scored = tf.join(df_, "term")
      .crossJoin(broadcast(sFrame))
      .select(col("source"), col("term"),
        floor((lit(1.0) + log(col("tf").cast("double")))
          * log(col("n_sources").cast("double") / col("df").cast("double"))
          * lit(1e6) + lit(0.5)).cast("long").as("score_micro"))
    val wK = Window.partitionBy(col("source"))
      .orderBy(col("score_micro").desc, col("term").asc)
    scored.withColumn("rk", row_number().over(wK).cast("long"))
      .filter(col("rk") <= k)
      .select(col("source"), col("rk"), col("term"), col("score_micro"))
      .orderBy(col("source").asc, col("rk").asc)
  }
}
