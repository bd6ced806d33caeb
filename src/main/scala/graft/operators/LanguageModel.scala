package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model scoring for corpus curation — the
  * perplexity-filter step of CCNet/Gopher-style pipelines (score every
  * document against a reference LM; prune or bucket the tail). The
  * model is a bigram LM with add-one smoothing:
  *
  *   p(w2 | w1) = (c(w1,w2) + 1) / (c(w1) + V)
  *
  * trained on any reference frame (self-scoring the corpus flags
  * machine-generated/templated outliers; a held-out reference corpus
  * gives the classic domain-mismatch filter).
  *
  * Scores are average per-bigram SURPRISAL in bits (perplexity =
  * 2^avg_bits — monotone, left to the consumer: `pow` is libm and
  * engines disagree in the last ulp). The log2 itself is computed
  * WITHOUT any transcendental function, so scores are bit-identical
  * on every engine and fully replayable by a SQL oracle:
  *
  *  - octave: j = #{ t in 1..64 : p <= 2^-t } — a comparison ladder
  *    against exact power-of-two literals, so p·2^j lands in (0.5, 1];
  *  - chord: log2(m) ~ 2m - 2 on (0.5, 1] (exact at both endpoints,
  *    max error 0.0861 bits at m = 1/ln2·? — property-tested), giving
  *    surprisal(p) = j + 2 - p·2^(j+1), one array lookup and one
  *    multiply of exact-scaled doubles.
  *
  * The approximation bias is IDENTICAL on both engines (they evaluate
  * the same IEEE expression), so the oracle gate compares exact
  * equality; the ≤0.09-bit systematic error only matters to the
  * consumer and is documented at the call sites. p < 2^-64 clamps to
  * the top rung (error grows past ~43 bits of surprisal — beyond any
  * add-one-smoothed bigram model's range until corpus size ~2^64).
  *
  * Order-independence: per-bigram surprisal is quantized to integer
  * MICRO-BITS before the per-document sum (double addition is not
  * associative; integer addition is), the same decimal-quantization
  * policy as Cols.sumExact.
  *
  * Scale shape: unigram/vocab frames are broadcast (vocab ≪ corpus);
  * the bigram count table is left to AQE (broadcast when it measures
  * small, shuffle join for vocab² blowups); the per-doc reduce is one
  * map-side-combinable aggregation. The corpus shuffles once, on the
  * bigram join key.
  */
object LanguageModel {

  /** Comparison-ladder depth: p >= 2^-64 resolves exactly; smaller
    * clamps to the top rung. */
  val MaxOctave = 64

  /** Exact powers of two 2^1 .. 2^(MaxOctave+1) for the scale lookup. */
  private val pow2: Seq[Double] = (1 to MaxOctave + 1).map(i => math.pow(2.0, i))

  /** Portable -log2(p) for p in (0, 1]: octave ladder + chord
    * interpolation, no libm. Exact at powers of two; error <= 0.0861
    * bits in between; monotone decreasing in p. */
  def surprisalBits(p: Column): Column = {
    val j = (1 to MaxOctave).map(t =>
      when(p <= lit(math.pow(2.0, -t)), 1).otherwise(0)).reduce(_ + _)
    val scale = element_at(typedlit(pow2), j + 1) // = 2^(j+1)
    j.cast("double") + lit(2.0) - p * scale
  }

  /** Tokenized (id, t: array) frame, persisted once per corpus under
    * the shared [[Persisted.index]] policy — every n-gram order and
    * both the train and score sides of a scoring call re-read this
    * frame instead of re-splitting the text (the same materialized-
    * derived-table pattern as the dedup signature index). */
  private def tokenized(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Persisted.index(docs.select(col(idCol), split(col(textCol), " ").as("t")))

  /** (id, w1, w2) adjacent-token bigrams of `textCol` (whitespace
    * tokens); documents with fewer than 2 tokens contribute none. */
  def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    tokenized(docs, idCol, textCol)
      .filter(size(col("t")) >= 2)
      .select(col(idCol), explode(
        zip_with(
          slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** Per-document average bigram surprisal in bits against a bigram LM
    * trained on `ref` (add-one smoothing, vocabulary = ref's unigram
    * set). Output: (idCol, n_bigrams, avg_bits); documents with < 2
    * tokens are absent (no bigram evidence). OOV continuations score
    * p = 1/(c(w1)+V); fully-OOV contexts score p = 1/V. An EMPTY
    * reference has no vocabulary — the model is undefined, so the
    * result is empty (the `v > 0` guard below also keeps the ANSI
    * divide from tripping on the degenerate frame). */
  def surprisalScores(docs: DataFrame, ref: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // count tables are the trained model — persisted under the shared
    // index policy (one cache entry per canonicalized plan), so repeat
    // scoring calls against the same reference train once
    val uni = Persisted.index(tokenized(ref, idCol, textCol).select(explode(col("t")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c_a")))
    val voc = uni.agg(count(lit(1)).as("v"))
    val bi = Persisted.index(bigrams(ref, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab")))
    val p = (coalesce(col("c_ab"), lit(0L)) + lit(1L)).cast("double") /
      (coalesce(col("c_a"), lit(0L)) + col("v")).cast("double")
    bigrams(docs, idCol, textCol)
      .join(bi, Seq("w1", "w2"), "left")
      .join(broadcast(uni), Seq("w1"), "left")
      .crossJoin(broadcast(voc))
      .filter(col("v") > 0)
      .select(col(idCol),
        floor(surprisalBits(p) * lit(1e6) + lit(0.5)).cast("long").as("su"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("su")).as("su_sum"))
      .select(col(idCol), col("n_bigrams"),
        (floor(col("su_sum").cast("double") / col("n_bigrams").cast("double") + lit(0.5))
          / lit(1e6)).as("avg_bits"))
  }

  /** (id, w1, w2, w3) adjacent-token trigrams; documents with fewer
    * than 3 tokens contribute none. */
  def trigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    tokenized(docs, idCol, textCol)
      .filter(size(col("t")) >= 3)
      .select(col(idCol), explode(
        zip_with(
          slice(col("t"), lit(1), size(col("t")) - 2),
          zip_with(
            slice(col("t"), lit(2), size(col("t")) - 2),
            slice(col("t"), lit(3), size(col("t")) - 2),
            (b, c) => struct(b.as("w2"), c.as("w3"))),
          (a, bc) => struct(a.as("w1"),
            bc.getField("w2").as("w2"), bc.getField("w3").as("w3")))).as("tg"))
      .select(col(idCol), col("tg.w1").as("w1"), col("tg.w2").as("w2"),
        col("tg.w3").as("w3"))

  /** Per-document average trigram surprisal under STUPID BACKOFF
    * (Brants et al., "Large Language Models in Machine Translation",
    * EMNLP 2007): score each trigram as
    *
    *   S(w3|w1,w2) = c123/c12                    if the trigram is in the model
    *               = α · c23/c2                  else if the (w2,w3) bigram is
    *               = α² · (c3+1)/(N+V)           otherwise (add-one on the
    *                                             unigram floor keeps S > 0
    *                                             for OOV w3)
    *
    * with α = 0.4 (the published constant). Scores are MLE ratios, not
    * probabilities — the standard web-scale trade: no discounting pass
    * over the count tables. Every branch is a ratio of integers times
    * an exact literal, so S is bit-identical cross-engine and the
    * surprisal ladder ([[surprisalBits]]) replays in the oracle.
    * Count tables carry their context denominator in the same row
    * (c123 WITH c12, c23 WITH c2), so scoring joins each model table
    * once. Per-doc sums are integer micro-bits (order-independent).
    * Same degenerate contracts as [[surprisalScores]]: empty reference
    * → empty result; docs with < 3 tokens absent. */
  def backoffScores(docs: DataFrame, ref: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", alpha: Double = 0.4): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    // model count tables persist under the shared index policy (see
    // surprisalScores) — repeat scoring calls train once
    val refTok = tokenized(ref, idCol, textCol).select(explode(col("t")).as("w"))
    val uni = Persisted.index(refTok.groupBy(col("w")).agg(count(lit(1)).as("c1")))
    val tot = uni.agg(sum(col("c1")).as("n_tok"), count(lit(1)).as("v"))
    val bi = Persisted.index(bigrams(ref, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12")))
    // trigram rows carry their context bigram count
    val tri = Persisted.index(trigrams(ref, idCol, textCol)
      .groupBy(col("w1"), col("w2"), col("w3")).agg(count(lit(1)).as("c123"))
      .join(bi, Seq("w1", "w2")))
    // bigram model keyed by (w2, w3) with its context unigram count
    val biM = bi.select(col("w1").as("w2"), col("w2").as("w3"), col("c12").as("c23"))
      .join(uni.select(col("w").as("w2"), col("c1").as("c2")), Seq("w2"))
    val s = when(col("c123").isNotNull,
        col("c123").cast("double") / col("c12").cast("double"))
      .when(col("c23").isNotNull,
        lit(alpha) * (col("c23").cast("double") / col("c2").cast("double")))
      .otherwise(lit(alpha) * lit(alpha) *
        ((coalesce(col("c3"), lit(0L)) + lit(1L)).cast("double")
          / (col("n_tok") + col("v")).cast("double")))
    trigrams(docs, idCol, textCol)
      .join(tri, Seq("w1", "w2", "w3"), "left")
      .join(biM, Seq("w2", "w3"), "left")
      .join(broadcast(uni.select(col("w").as("w3"), col("c1").as("c3"))), Seq("w3"), "left")
      .crossJoin(broadcast(tot))
      .filter(col("v") > 0)
      .select(col(idCol),
        floor(surprisalBits(s) * lit(1e6) + lit(0.5)).cast("long").as("su"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"), sum(col("su")).as("su_sum"))
      .select(col(idCol), col("n_trigrams"),
        (floor(col("su_sum").cast("double") / col("n_trigrams").cast("double") + lit(0.5))
          / lit(1e6)).as("avg_bits"))
  }

  // ------------------------------------------------------------ oracle

  /** SQL expression replaying [[surprisalBits]] over the probability
    * expression `p` — the identical ladder literals, scale lookup, and
    * association order. Shared-dialect spelling: the scale table
    * renders as `list_value(...)` (≡ DuckDB's `[...]` literal, and
    * alias-bridged to Spark's `array`) and the lookup as
    * `list_extract` (1-based on both engines via the `element_at`
    * bridge), so every oracle built on this expression stays inside
    * the verbatim two-engine dialect. */
  def dkSurprisal(p: String): String = {
    val j = (1 to MaxOctave).map(t =>
      s"(CASE WHEN $p <= ${math.pow(2.0, -t)} THEN 1 ELSE 0 END)").mkString(" + ")
    val lst = pow2.mkString("list_value(", ", ", ")")
    s"(CAST(($j) AS DOUBLE) + 2.0 - $p * list_extract($lst, ($j) + 1))"
  }
}
