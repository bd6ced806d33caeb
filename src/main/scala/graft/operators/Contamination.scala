package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval contamination detection — find training documents that
  * share long token n-grams with a benchmark (evaluation) set, the
  * standard decontamination step before LLM training (the GPT-3
  * appendix-C / PaLM style n-gram collision rule).
  *
  * Not part of the reference's surface — a SURVEY.md §7.4 north-star
  * extension over the `documents` table.
  *
  * Scale shape: the benchmark side is an EVAL set — thousands of
  * docs, not billions — so its exploded n-gram index is broadcast and
  * the 100 TB corpus is matched map-side with zero corpus shuffle
  * before the per-pair rollup (which is linear in collisions, not in
  * corpus size). Shingle hashing reuses the portable
  * [[TextDedup]] / `graft_shingle_hashes` kernel pipeline, so the
  * DuckDB oracle replays the exact hashes.
  */
object Contamination {

  /** (corpus_doc, bench_doc, hits) for every corpus×benchmark pair
    * sharing ≥ `minHits` distinct token n-grams. `n` is the collision
    * gram length — long grams (8+) mean verbatim overlap, not topical
    * similarity. */
  def overlapPairs(corpus: DataFrame, benchmark: DataFrame, n: Int = 8,
      minHits: Long = 1, fast: Boolean = false): DataFrame = {
    require(n >= 1, "overlapPairs needs n >= 1")
    val c = TextDedup.shingleIndex(corpus, n, fast)
      .select(col("doc_id").as("corpus_doc"), col("sh"))
    val b = TextDedup.shingleIndex(benchmark, n, fast)
      .select(col("doc_id").as("bench_doc"), col("sh"))
    c.join(broadcast(b), "sh")
      .groupBy(col("corpus_doc"), col("bench_doc"))
      .agg(count(lit(1)).as("hits"))
      .filter(col("hits") >= minHits)
  }

  /** Per-corpus-doc contamination rollup: how many benchmark docs it
    * collides with, the worst single overlap, and total collisions. */
  def report(corpus: DataFrame, benchmark: DataFrame, n: Int = 8,
      minHits: Long = 1, fast: Boolean = false): DataFrame =
    overlapPairs(corpus, benchmark, n, minHits, fast)
      .groupBy(col("corpus_doc"))
      .agg(
        count(lit(1)).as("bench_docs"),
        max(col("hits")).as("max_hits"),
        sum(col("hits")).as("total_hits"))

  /** The corpus minus contaminated docs (anti-join on the report) —
    * what actually ships to training. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, n: Int = 8,
      minHits: Long = 1, fast: Boolean = false): DataFrame =
    corpus.join(
      report(corpus, benchmark, n, minHits, fast)
        .select(col("corpus_doc").as("doc_id")),
      Seq("doc_id"), "left_anti")
}
