package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: token
  * statistics, quality scoring, language identification, and document
  * fingerprinting (SURVEY.md §7.4 north-star extensions over the
  * `documents` table).
  *
  * Everything is built-in column expressions — per-row, shuffle-free,
  * codegen-friendly; the only shuffles are the final rollups.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def nTokens(text: Column): Column = size(split(text, " "))

  /** Subword ("BPE-ish") token estimate: ⌈len/4⌉ pieces per word —
    * integer arithmetic so engines agree exactly ((len+3) div 4 ≡
    * (len+3) >> 2 for the non-negative lengths). A real tokenizer
    * plugs in here as a custom Expression over a vocab broadcast. */
  def nSubwords(text: Column): Column =
    aggregate(
      transform(split(text, " "), w => shiftright(length(w) + 3, 2).cast("long")),
      lit(0L), (a, x) => a + x)

  /** BPE-style pre-tokenizer count: the GPT-2-ish split of runs of
    * letters, single digits, and punctuation. The whitespace class is
    * spelled out explicitly — Java's \s includes vertical tab, RE2's
    * does not, so a bare \s would diverge between engine and oracle. */
  val bpeSplitPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\f\\r]"
  def nRegexTokens(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeSplitPattern), lit(0))).cast("long")

  /** Character-class profile ratios, all guarded against empty text. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") /
      nullif(length(text), lit(0)).cast("double")

  /** English stopword ratio over whitespace tokens. */
  val stopwords = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
  def stopwordRatio(text: Column): Column =
    size(filter(split(text, " "), w => array_contains(typedLit(stopwords), w)))
      .cast("double") / nTokens(text).cast("double")

  /** Type-token ratio (vocabulary diversity). */
  def typeTokenRatio(text: Column): Column =
    size(array_distinct(split(text, " "))).cast("double") /
      nTokens(text).cast("double")

  /** The four component scores of [[qualityScore]], exposed
    * individually so downstream operators (e.g. the trained-filter
    * distillation in [[graft.analytics.DataOps.clfQualityWeights]])
    * can use the rule's own basis as features. Each is an exact
    * multiple of 0.5 — no FP noise crosses an engine boundary. */
  def lengthScore(text: Column): Column = {
    val nt = nTokens(text).cast("double")
    when(nt >= 20 && nt <= 80, 1.0).when(nt >= 10, 0.5).otherwise(0.0)
  }
  def stopwordScore(text: Column): Column =
    when(stopwordRatio(text) >= 0.05, 1.0).otherwise(0.0)
  def diversityScore(text: Column): Column = {
    val ttr = typeTokenRatio(text)
    when(ttr >= 0.3, 1.0).when(ttr >= 0.15, 0.5).otherwise(0.0)
  }
  def wordLengthScore(text: Column): Column = {
    val nt = nTokens(text).cast("double")
    val awl = (length(text) - nt + 1) / nt // avg word length
    when(awl >= 3 && awl <= 10, 1.0).otherwise(0.0)
  }

  /** Composite quality score in [0,1] — the standard pre-training
    * heuristics (length band, stopword presence, lexical diversity,
    * mean word length band), equal-weighted. Deterministic double
    * arithmetic, identical formula in the oracle. */
  def qualityScore(text: Column): Column =
    (lengthScore(text) + stopwordScore(text) + diversityScore(text) +
      wordLengthScore(text)) / 4.0

  /** Marker-word language profiles: tiny per-language function-word
    * lists. On real multilingual text this separates languages by
    * counting hits per profile (see TextAnalysisSpec); it is an
    * n-gram-profile LID reduced to its deterministic core. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Fixed language order — also the argmax tie-break order. */
  val langOrder: Seq[String] = Seq("en", "de", "fr", "es", "zh")

  def langScore(text: Column, lang: String): Column =
    size(filter(split(lower(text), " "),
      w => array_contains(typedLit(langMarkers(lang)), w)))

  /** Shared argmax: highest marker count wins, ties broken by
    * [[langOrder]], 'und' when no marker hits. Both language-ID forms
    * use this single definition so they cannot drift. */
  def pickLang(scores: Seq[Column]): Column = {
    require(scores.size == langOrder.size)
    val best = greatest(scores: _*)
    langOrder.zip(scores).foldLeft(when(best <= 0, lit("und"))) {
      case (acc, (l, s)) => acc.when(s === best, lit(l))
    }.otherwise(lit("und"))
  }

  /** Predicted language = argmax marker count (expression form). */
  def predictedLang(text: Column): Column =
    pickLang(langOrder.map(l => langScore(text, l)))

  /** Rolling-hash document fingerprint: md5 of normalized text —
    * identical hex in every engine. (Passage-level rolling-hash
    * fingerprints: [[TextDedup.withWinnowFingerprints]].) */
  def fingerprint(text: Column): Column =
    md5(TextDedup.normalized(text))

  /** Per-document n-gram repetition statistics — the Gopher-style
    * "repetitious document" quality signals (Rae et al. 2021, §A1.1):
    * the fraction of n-gram instances occupied by the single most
    * frequent n-gram (`top_ngram_frac`) and the fraction covered by
    * any n-gram occurring more than once (`dup_ngram_frac`). High
    * values flag boilerplate/spam for removal before training.
    *
    * Relational form — explode n-grams, count per (doc, gram), fold to
    * per-doc totals: two partial-aggregable shuffles keyed by doc id
    * (high cardinality, parallelizes at any scale), never a per-row
    * interpreted map over a whole document. Docs shorter than n tokens
    * get zero counts and NULL fractions (no n-grams to be repetitious
    * over). */
  def ngramRepetition(docs: DataFrame, n: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(n >= 1, "ngramRepetition needs n >= 1")
    val toks = split(col(textCol), " ")
    // guard: sequence(1, k) DESCENDS when k < 1 — an unguarded short
    // doc would produce phantom n-grams instead of none
    val gramArr = when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
    val grams = docs.select(col(idCol), explode(gramArr).as("gram"))
    val counts = grams.groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("cnt"))
    val perDoc = counts.groupBy(col(idCol)).agg(
      sum(col("cnt")).as("n_ngrams"),
      max(col("cnt")).as("top_ngram_count"),
      sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).as("dup_ngram_count"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_ngrams"), lit(0L)).as("n_ngrams"),
        coalesce(col("top_ngram_count"), lit(0L)).as("top_ngram_count"),
        coalesce(col("dup_ngram_count"), lit(0L)).as("dup_ngram_count"))
      .withColumn("top_ngram_frac",
        col("top_ngram_count").cast("double") / nullif(col("n_ngrams"), lit(0L)).cast("double"))
      .withColumn("dup_ngram_frac",
        col("dup_ngram_count").cast("double") / nullif(col("n_ngrams"), lit(0L)).cast("double"))
  }

  /** Relational language-ID — identical output to [[predictedLang]]
    * but as codegen'd joins instead of 5 interpreted filter-lambdas
    * per row: marker lists become a broadcast (word, lang) table,
    * token explode + join + pivot yields the per-language counts,
    * then the same fixed-order argmax. This is the form that scales
    * (marker vocabulary is data, so growing languages/word-lists
    * never changes the plan shape). */
  def langIdJoin(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val markers = langMarkers.toSeq
      .flatMap { case (l, ws) => ws.map(w => (w, l)) }
      .toDF("w", "marker_lang")
    val counts = docs
      .select(col(idCol), explode(split(lower(col(textCol)), " ")).as("w"))
      .join(broadcast(markers), "w")
      .groupBy(col(idCol)).pivot("marker_lang", langOrder).count()
    docs.join(counts, Seq(idCol), "left")
      .withColumn("predicted",
        pickLang(langOrder.map(l => coalesce(col(l), lit(0L)))))
      .drop(langOrder: _*)
  }
}
