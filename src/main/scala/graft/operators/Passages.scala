package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Passage-level (sub-document) exact dedup — the line/paragraph
  * dedup step of web-corpus curation (CCNet, RefinedWeb): a document
  * may be unique as a whole while long spans of it repeat across the
  * corpus (boilerplate headers, licence blocks, templated copy).
  * Operates on fixed-width non-overlapping word windows so it applies
  * to any text (no delimiter assumptions); a newline-delimited corpus
  * would pass lines through the same occurrence-count plan.
  *
  * Scale shape: passages explode to ~|tokens|/w thin rows; the
  * occurrence count is one partial-aggregable groupBy on the passage
  * hash, and the join back to instances is an equi-join on the same
  * key — no all-pairs work anywhere. Joining on the md5 of the
  * passage (not the string) keeps shuffle rows narrow at 100 TB.
  */
object Passages {

  /** One row per passage instance: (idCol, passage_pos, passage,
    * passage_hash). Windows are w words, stride w; a trailing partial
    * window is dropped (it can't equal any full window). */
  def withPassages(docs: DataFrame, w: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(w >= 1, "withPassages needs window width >= 1")
    val toks = split(col(textCol), " ")
    val nPass = floor(size(toks).cast("double") / w).cast("int")
    // guard: sequence(0, k) DESCENDS when k < 0 — an unguarded short
    // doc would fabricate passages instead of producing none
    val passArr = when(nPass >= 1,
      transform(sequence(lit(0), nPass - 1),
        i => concat_ws(" ", slice(toks, i * w + 1, lit(w)))))
      .otherwise(array().cast("array<string>"))
    docs.select(col(idCol), posexplode(passArr))
      .withColumnRenamed("pos", "passage_pos")
      .withColumnRenamed("col", "passage")
      .withColumn("passage_hash", md5(col("passage")))
  }

  /** Corpus-wide occurrence count per distinct passage. */
  def passageCounts(docs: DataFrame, w: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    withPassages(docs, w, idCol, textCol)
      .groupBy(col("passage_hash"), col("passage"))
      .agg(count(lit(1)).as("n_occurrences"), countDistinct(col(idCol)).as("n_docs"))

  /** Each passage instance annotated with its corpus-wide occurrence
    * count — the frame a curation pipeline filters (`n_occurrences
    * > 1` = the span repeats somewhere) or rewrites documents from.
    *
    * Single pass: `count().over(partitionBy(passage_hash))` — ONE
    * shuffle on the hash, versus the groupBy + join-back form, which
    * tokenizes and explodes the whole corpus twice (once per join
    * side). A keyed window with no ORDER BY never funnels through a
    * single partition, so this stays shuffle-linear at 100 TB.
    *
    * Trade-off, measured on a 10× hot-key corpus: every instance of a
    * hot passage lands in ONE window partition (window state can't
    * partial-aggregate), so on boilerplate-dominated corpora — a few
    * passages repeated millions of times — the two-pass groupBy form
    * ([[passageCounts]] + broadcast join of the count frame) wins:
    * map-side combine collapses hot keys before the shuffle. Default
    * stays single-pass; switch for pathological duplication. */
  def withOccurrenceCounts(docs: DataFrame, w: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    withPassages(docs, w, idCol, textCol)
      .withColumn("n_occurrences",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("passage_hash"))))

  /** The k most repeated passages (≥ minCount occurrences) — the
    * boilerplate candidates a curation run reviews and blocklists.
    * Total order (count desc, passage asc) ⇒ deterministic top-k. */
  def boilerplateTopK(docs: DataFrame, w: Int, k: Int, minCount: Long = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    passageCounts(docs, w, idCol, textCol)
      .filter(col("n_occurrences") >= minCount)
      .select(col("passage"), col("n_occurrences"), col("n_docs"))
      .orderBy(col("n_occurrences").desc, col("passage").asc)
      .limit(k)

  /** OVERLAPPING chunker — the retrieval/RAG complement of
    * [[withPassages]] (stride < width ⇒ context is never split at a
    * hard boundary). Chunk starts are 0, stride, 2·stride … while a
    * full `w`-token window fits, PLUS a tail-aligned start at
    * n − w when the last full window would leave tokens uncovered —
    * every token lands in ≥ 1 chunk with at most w-token overlap. A
    * doc shorter than `w` yields its whole text as one chunk (an
    * empty-string doc is a single empty token on both engines, so it
    * yields one empty chunk). Output: one row per chunk
    * (idCol, chunk_start [0-based token offset], chunk_tokens,
    * is_tail, chunk) plus passthrough of `keep` columns.
    *
    * Deterministic and relational on both engines (the oracle
    * replays starts, slices and flags with the same arithmetic); at
    * scale it is one map-side explode — no shuffle at all until the
    * caller aggregates. */
  def withChunks(docs: DataFrame, w: Int, stride: Int,
      idCol: String = "doc_id", textCol: String = "text",
      keep: Seq[String] = Seq.empty): DataFrame = {
    require(w >= 1 && stride >= 1 && stride <= w,
      "withChunks needs 1 <= stride <= w")
    val toks = split(col(textCol), " ")
    val n = size(toks)
    val lastFull = floor((n - w).cast("double") / stride).cast("int")
    val starts = when(n >= w,
        when(pmod(n - w, lit(stride)) =!= 0,
          concat(transform(sequence(lit(0), lastFull), i => i * stride),
            array(n - w)))
          .otherwise(transform(sequence(lit(0), lastFull), i => i * stride)))
      .otherwise(when(n > 0, array(lit(0))).otherwise(array().cast("array<int>")))
    docs.select(col(idCol) +: keep.map(col) :+
        col(textCol).as("__t") :+ explode(starts).as("chunk_start"): _*)
      .withColumn("chunk",
        concat_ws(" ", slice(split(col("__t"), " "), col("chunk_start") + 1, lit(w))))
      .withColumn("chunk_tokens",
        size(slice(split(col("__t"), " "), col("chunk_start") + 1, lit(w))))
      .withColumn("is_tail", (pmod(col("chunk_start"), lit(stride)) =!= 0).cast("int"))
      .drop("__t")
  }
}
