package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BM25 keyword relevance over a document corpus — the standard
  * lexical retrieval scorer (Robertson/Spärck Jones Okapi BM25, with
  * the Lucene-style non-negative idf = ln(1 + (N-df+0.5)/(df+0.5))).
  *
  * Not part of the reference's surface — a SURVEY.md §7.4 north-star
  * extension: lexical retrieval is the quality-filtering and
  * targeted-subset-selection workhorse of training-data curation
  * (pull every doc matching a probe query, score corpus vs seed set).
  *
  * Scale shape:
  *  - Term frequencies are one partial-agg shuffle on (doc, term) —
  *    and the query-term filter is applied BEFORE that shuffle, so
  *    only rows for the handful of query terms ever move.
  *  - Document-frequency stats roll up from the per-doc tf frame
  *    (never a second tokenize pass) and are broadcast back.
  *  - Corpus-wide constants (N, avgdl) ride the same broadcast.
  *  - Top-k is TakeOrderedAndProject, never a global sort.
  *
  * Oracle parity: per-term scores are quantized to 1e-6 (floor
  * rounding) and summed as longs — integer addition is
  * order-independent, so the engine's partial-agg order can't flip
  * the hash gate the way a double sum would.
  */
object Relevance {

  /** (doc_id, term, tf, dl): term frequency per doc plus the doc's
    * token length, for the query terms only. */
  def termFreqs(docs: DataFrame, queryTerms: Seq[String]): DataFrame = {
    val toks = TextDedup.tokenized(docs)
      .select(col("doc_id"), size(col("tokens")).as("dl"), explode(col("tokens")).as("term"))
    toks.filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
  }

  /** Corpus constants: doc count and average token length (computed
    * as exact-integer sum / count in double, replayable verbatim). */
  def corpusStats(docs: DataFrame): DataFrame =
    TextDedup.tokenized(docs)
      .agg(count(lit(1)).as("n_docs"),
        (sum(size(col("tokens"))).cast("double") / count(lit(1))).as("avgdl"))

  /** Top-k docs for a bag-of-words query under BM25(k1, b). Output:
    * (doc_id, score) with score floor-rounded to 1e-6; the top-k cut
    * orders by the QUANTIZED score with an id tiebreak, so the
    * boundary is deterministic across engines. */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && k > 0, "bm25TopK needs query terms and k > 0")
    val tf = termFreqs(docs, queryTerms)
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = corpusStats(docs)
    val scored = tf
      .join(broadcast(df_), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("tscore",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      // quantize BEFORE the sum: long addition is order-independent
      .withColumn("tscore_q", floor(col("tscore") * 1e6 + 0.5).cast("long"))
      .groupBy(col("doc_id"))
      .agg((sum(col("tscore_q")).cast("double") / 1e6).as("score"))
    scored
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("score"))
  }

  /** Top-k docs for a bag-of-words query under classic log-tf·idf
    * TF-IDF: score(d) = Σ_{t∈q∩d} (1 + ln tf) · ln(N / df) — the
    * length-insensitive complement of [[bm25TopK]] (no dl/avgdl
    * saturation; a doc repeating a rare term wins linearly in ln tf).
    * Same scale shape and the same oracle-parity contract: per-term
    * contributions are quantized to 1e-6 longs BEFORE the sum, the
    * top-k cut orders by quantized score with an id tiebreak, and the
    * corpus-N frame rides a 1-row broadcast (the J2 pattern). */
  def tfidfTopK(docs: DataFrame, queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty && k > 0, "tfidfTopK needs query terms and k > 0")
    val tf = termFreqs(docs, queryTerms)
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(broadcast(df_), "term")
      .crossJoin(broadcast(stats))
      .withColumn("tscore",
        (lit(1.0) + log(col("tf").cast("double"))) * log(col("n_docs") / col("df")))
      .withColumn("tscore_q", floor(col("tscore") * 1e6 + 0.5).cast("long"))
      .groupBy(col("doc_id"))
      .agg((sum(col("tscore_q")).cast("double") / 1e6).as("score"))
    scored
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("score"))
  }
}
