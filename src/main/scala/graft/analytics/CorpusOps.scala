package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Cols
import org.apache.spark.sql.expressions.Window
import graft.operators.{Contamination, Curation, Packing, Quantize, Relevance, Sharding, Similarity, TextDedup, ZOrder}

/** Corpus-preparation query surface: deterministic shuffle/sharding,
  * train/eval decontamination, BM25 retrieval, and int8-quantized
  * similarity — the steps between "clean documents" and "training
  * shards on disk" (SURVEY.md §7.4 north-star extensions, same
  * first-class footing as [[DataOps]]).
  *
  * Every oracle replays the exact algorithm in DuckDB SQL — md5 order
  * keys, the unrolled hex fold, portable shingle hashes, quantization
  * arithmetic — so the hash gate checks the full pipeline. All
  * numeric literals in generated SQL are emitted from the same Scala
  * doubles the Spark plans use (Double.toString round-trips), so both
  * engines parse bit-identical constants.
  */
object CorpusOps {

  private val P = TextDedup.P

  // ---- deterministic shuffle + sharding ------------------------------

  private val ShardSeed = "epoch0"
  private val NShards = 8

  /** Per-shard plan of the deterministic corpus shuffle: sizes plus
    * the first doc in each shard's replay order. */
  def shardPlan(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("n_chars"))
    val sharded = Sharding.withPosition(
      Sharding.withShard(docs, "doc_id", NShards, ShardSeed), "doc_id")
    sharded.groupBy(col("shard"))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("n_chars")).as("chars"),
        max(when(col("pos") === 1, col("doc_id"))).as("first_doc"))
      .orderBy(col("shard").asc)
  }

  /** DuckDB: the same 12-char hex-prefix fold [[Sharding.hexPrefixValue]]
    * unrolls — nested arithmetic, base 16, ascii decode per char. */
  private def dkHexFold(key: String, chars: Int): String =
    (1 to chars).foldLeft("CAST(0 AS BIGINT)") { (acc, i) =>
      val a = s"ascii(substr($key, $i, 1))"
      s"($acc * 16 + CAST(CASE WHEN $a >= 97 THEN $a - 87 ELSE $a - 48 END AS BIGINT))"
    }

  private val shardPlanSql: String = {
    val okey = s"md5(concat_ws(':', '$ShardSeed', CAST(doc_id AS VARCHAR(30))))"
    s"""WITH keyed AS (
       |  SELECT doc_id, n_chars, $okey AS okey FROM documents
       |), sharded AS (
       |  SELECT doc_id, n_chars, okey,
       |         CAST(${dkHexFold("okey", 12)} % $NShards AS INT) AS shard
       |  FROM keyed
       |), pos AS (
       |  SELECT *, row_number() OVER (PARTITION BY shard ORDER BY okey ASC, doc_id ASC) AS pos
       |  FROM sharded
       |)
       |SELECT shard, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars,
       |       max(CASE WHEN pos = 1 THEN doc_id END) AS first_doc
       |FROM pos GROUP BY shard ORDER BY shard ASC""".stripMargin
  }

  // ---- decontamination ----------------------------------------------

  private val ContamN = 8
  private val BenchSource = "src0"

  /** Corpus docs sharing ≥1 token 8-gram with the benchmark slice
    * (source = src0) — the pre-training decontamination report. */
  def contamPairs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Contamination.overlapPairs(
        docs.filter(col("source") =!= BenchSource),
        docs.filter(col("source") === BenchSource), n = ContamN)
      .orderBy(col("corpus_doc").asc, col("bench_doc").asc)
  }

  /** DuckDB: portable char-fold word hash (= TextDedup.charFold). */
  private def dkWordHash(w: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(generate_series(1, greatest(length($w), 1), 1), " +
      s"i -> CAST(ascii(substr($w, i, 1)) AS BIGINT))), (acc, x) -> (acc * 31 + x) % $P)"

  private def dkShinglesN(n: Int): String =
    s"""CASE WHEN len(th) < $n THEN list_slice(th, 1, 0) ELSE
       |  list_distinct(list_transform(generate_series(1, len(th) - ${n - 1}, 1),
       |    i -> list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(th, i, i + ${n - 1})),
       |         (acc, h) -> (acc * 131 + h) % $P))) END""".stripMargin

  /** Shared contamination shingle CTEs (token hashes → distinct
    * 8-gram shingles, tagged with source). */
  private lazy val dkContamShCtes =
    s"""th AS (
       |  SELECT doc_id, source,
       |         list_transform(string_split(text, ' '), w -> ${dkWordHash("w")}) AS th
       |  FROM documents
       |), sh AS (
       |  SELECT doc_id, source, unnest(${dkShinglesN(ContamN)}) AS s FROM th
       |)""".stripMargin

  private val contamPairsSql: String =
    s"""WITH $dkContamShCtes
       |SELECT c.doc_id AS corpus_doc, b.doc_id AS bench_doc, count(*) AS hits
       |FROM (SELECT * FROM sh WHERE source <> '$BenchSource') c
       |JOIN (SELECT * FROM sh WHERE source = '$BenchSource') b USING (s)
       |GROUP BY 1, 2
       |ORDER BY corpus_doc ASC, bench_doc ASC""".stripMargin

  /** The SCRUB end of decontamination under the hash gate: corpus
    * minus every doc colliding with the benchmark slice
    * ([[Contamination.decontaminate]] — detection + anti-join), rolled
    * up per source. The oracle replays shingle hashing, the collision
    * join, AND the anti-join — completing the detect→report→scrub
    * chain (contam_pairs gates detection; this gates what actually
    * ships to training). */
  def contamScrub(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Contamination.decontaminate(
        docs.filter(col("source") =!= BenchSource),
        docs.filter(col("source") === BenchSource), n = ContamN)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_chars")).cast("long").as("kept_chars"))
      .orderBy(col("source").asc)
  }

  private val contamScrubSql: String =
    s"""WITH $dkContamShCtes,
       |chits AS (
       |  SELECT DISTINCT c.doc_id
       |  FROM (SELECT * FROM sh WHERE source <> '$BenchSource') c
       |  JOIN (SELECT * FROM sh WHERE source = '$BenchSource') b USING (s)
       |)
       |SELECT source, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS kept_chars
       |FROM documents
       |WHERE source <> '$BenchSource' AND doc_id NOT IN (SELECT doc_id FROM chits)
       |GROUP BY source
       |ORDER BY source ASC""".stripMargin

  // ---- BM25 retrieval -----------------------------------------------

  private val Bm25Terms = Seq("dup", "vector", "hash")
  private val Bm25K = 15
  private val K1 = 1.2
  private val B = 0.75

  /** Top-15 docs for a mixed rare/common probe query under BM25. */
  def bm25Probe(spark: SparkSession, dir: String): DataFrame =
    Relevance.bm25TopK(Tables.documents(spark, dir), Bm25Terms, Bm25K, K1, B)

  /** Shared BM25 CTE block (through per-doc `bmdoc(doc_id, score)`),
    * reused verbatim by the probe gate and the hybrid-fusion gate so
    * the lexical leg can never drift between them. */
  private val bm25Ctes: String = {
    val terms = Bm25Terms.map(t => s"'$t'").mkString(", ")
    // every constant below prints from the SAME Scala double the Spark
    // plan uses, so both engines parse identical bits
    val k1p1 = (K1 + 1.0).toString
    val oneMinusB = (1.0 - B).toString
    s"""toks AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
       |         unnest(string_split(text, ' ')) AS term
       |  FROM documents
       |), tf AS (
       |  SELECT doc_id, dl, term, count(*) AS tf FROM toks
       |  WHERE term IN ($terms) GROUP BY 1, 2, 3
       |), dfreq AS (
       |  SELECT term, count(*) AS df FROM tf GROUP BY 1
       |), stats AS (
       |  SELECT count(*) AS n_docs,
       |         CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*) AS avgdl
       |  FROM documents
       |), scored AS (
       |  SELECT tf.doc_id,
       |         CAST(floor(
       |           ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
       |             * (tf * $k1p1)
       |             / (tf + $K1 * ($oneMinusB + ($B * dl) / avgdl))
       |           * 1e6 + 0.5) AS BIGINT) AS tq
       |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
       |), bmdoc AS (
       |  SELECT doc_id, CAST(sum(tq) AS DOUBLE) / 1e6 AS score
       |  FROM scored GROUP BY doc_id
       |)""".stripMargin
  }

  private val bm25ProbeSql: String =
    s"""WITH $bm25Ctes
       |SELECT doc_id, score FROM bmdoc
       |ORDER BY score DESC, doc_id ASC LIMIT $Bm25K""".stripMargin

  // ---- int8-quantized similarity ------------------------------------

  /** Top-5 neighbors per probe query by int8-quantized cosine — the
    * 4×-smaller-footprint variant of sim_topk. */
  def simTopKQ8(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Quantize.q8TopK(emb, emb.filter(col("vec_id") < 10), k = 5)
      .orderBy(col("query_id").asc, col("rank").asc)
  }

  /** DuckDB: integer dot product — exact, order-independent. Shared
    * dialect (r12): index-aligned list_extract over generate_series
    * instead of list_zip's positional struct subscripts (DuckDB-only);
    * callers guarantee non-empty vectors. */
  private def dkIntDot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(generate_series(1, len($a)), " +
      s"i -> CAST(list_extract($a, i) AS BIGINT) * CAST(list_extract($b, i) AS BIGINT))), " +
      s"(acc, v) -> acc + v)"

  /** DuckDB: double dot product in the engine's exact fold order
    * (= Similarity.dot / graft_dot). Shared dialect — see
    * [[dkIntDot]]. */
  private def dkDblDot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(generate_series(1, len($a)), " +
      s"i -> CAST(list_extract($a, i) AS DOUBLE) * CAST(list_extract($b, i) AS DOUBLE))), " +
      s"(acc, v) -> acc + v)"

  private val simTopKQ8Sql: String =
    s"""WITH q8 AS (
       |  SELECT vec_id,
       |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) *
       |           (CASE WHEN list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))) > 0.0
       |                 THEN 127.0 / list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE))))
       |                 ELSE 0.0 END) + 0.5) AS INT)) AS q8
       |  FROM embeddings
       |), normed AS (
       |  SELECT vec_id, q8, sqrt(CAST(${dkIntDot("q8", "q8")} AS DOUBLE)) AS nrm FROM q8
       |), scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         CASE WHEN q.nrm > 0.0 AND c.nrm > 0.0
       |              THEN floor(CAST(${dkIntDot("q.q8", "c.q8")} AS DOUBLE)
       |                     / (q.nrm * c.nrm) * 1e6 + 0.5) / 1e6
       |              ELSE 0.0 END AS qcos
       |  FROM normed c JOIN normed q ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < 10
       |), ranked AS (
       |  SELECT query_id, neighbor_id, qcos,
       |         row_number() OVER (PARTITION BY query_id ORDER BY qcos DESC, neighbor_id ASC) AS rank
       |  FROM scored
       |)
       |SELECT query_id, rank, neighbor_id, qcos FROM ranked
       |WHERE rank <= 5
       |ORDER BY query_id ASC, rank ASC""".stripMargin

  // ---- hybrid retrieval: BM25 ⊕ cosine via reciprocal-rank fusion ----

  private val RrfC = 60       // the published RRF constant (Cormack et al. 2009)
  private val HybridLegK = 20 // per-leg candidate depth
  private val HybridOut = 15

  /** Hybrid retrieval: RECIPROCAL-RANK FUSION (Cormack, Clarke &
    * Büttcher, SIGIR 2009) of the lexical BM25 leg over `documents`
    * and the semantic cosine leg over the aligned `embeddings` row
    * (vec_id ≡ doc_id; query = vec 0) — the standard two-channel
    * retrieval stack, fused on RANKS so the two legs' incomparable
    * score scales never meet: rrf(d) = Σ_legs 1/(C + rank_leg(d)),
    * with a leg contributing 0 when d is outside its top-k.
    *
    * Portability: ranks are integers, each contribution is ONE IEEE
    * division of integers, and the two-term sum is written in the
    * same order on both engines before micro-quantization — no score
    * normalization, no transcendentals beyond the BM25 leg's own
    * (already hash-proven) idf. Absent-leg ranks surface as 0 in the
    * output (not NULL — "not in this leg's top-k", and the gate's
    * dtype stays integral).
    *
    * Scale shape: each leg is its own bounded top-k (TakeOrdered /
    * windowed rank over ≤ leg-k rows); the fusion full-outer-joins
    * two ≤ k-row frames — driver-scale work no matter the corpus. */
  def hybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir)
    val lex = Relevance.bm25TopK(docs, Bm25Terms, HybridLegK, K1, B)
      .withColumn("r_lex", row_number().over(
        Window.partitionBy(pmod(col("doc_id"), lit(1L)))
          .orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
      .select(col("doc_id"), col("r_lex"))
    val sem = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0), HybridLegK)
      .select(col("neighbor_id").as("doc_id"), col("rank").cast("long").as("r_sem"))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf_micro", floor(
        (coalesce(lit(1.0) / (lit(RrfC) + col("r_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfC) + col("r_sem")), lit(0.0))) * lit(1e6) + lit(0.5))
        .cast("long"))
      .select(col("doc_id"), coalesce(col("r_lex"), lit(0L)).as("r_lex"),
        coalesce(col("r_sem"), lit(0L)).as("r_sem"), col("rrf_micro"))
      .orderBy(col("rrf_micro").desc, col("doc_id").asc)
      .limit(HybridOut)
  }

  private val hybridRrfSql: String =
    s"""WITH $bm25Ctes,
       |lexr AS (
       |  SELECT doc_id, CAST(r AS BIGINT) AS r_lex FROM (
       |    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
       |    FROM bmdoc)
       |  WHERE r <= $HybridLegK
       |), semscored AS (
       |  SELECT c.vec_id AS doc_id,
       |         floor(${dkDblDot("q.embedding", "c.embedding")}
       |           / (sqrt(${dkDblDot("q.embedding", "q.embedding")})
       |              * sqrt(${dkDblDot("c.embedding", "c.embedding")})) * 1e6 + 0.5) / 1e6 AS cos
       |  FROM embeddings c JOIN embeddings q ON q.vec_id = 0 AND c.vec_id <> q.vec_id
       |), semr AS (
       |  SELECT doc_id, CAST(r AS BIGINT) AS r_sem FROM (
       |    SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS r
       |    FROM semscored)
       |  WHERE r <= $HybridLegK
       |), fused AS (
       |  SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
       |         coalesce(l.r_lex, 0) AS r_lex, coalesce(s.r_sem, 0) AS r_sem,
       |         CAST(floor((coalesce(1.0 / ($RrfC + l.r_lex), 0.0)
       |                     + coalesce(1.0 / ($RrfC + s.r_sem), 0.0)) * 1e6 + 0.5) AS BIGINT)
       |           AS rrf_micro
       |  FROM lexr l FULL OUTER JOIN semr s ON l.doc_id = s.doc_id
       |)
       |SELECT doc_id, CAST(r_lex AS BIGINT) AS r_lex, CAST(r_sem AS BIGINT) AS r_sem, rrf_micro
       |FROM fused
       |ORDER BY rrf_micro DESC, doc_id ASC LIMIT $HybridOut""".stripMargin

  // ---- sequence packing ---------------------------------------------

  private val SeqLen = 512

  /** Per-shard concat-and-chunk packing summary at seqLen=512 over
    * the deterministic shuffle order. */
  def packPlan(spark: SparkSession, dir: String): DataFrame =
    Packing.packSummary(Tables.documents(spark, dir),
      "doc_id", size(split(col("text"), " ")), NShards, ShardSeed, SeqLen)

  private val packPlanSql: String = {
    val okey = s"md5(concat_ws(':', '$ShardSeed', CAST(doc_id AS VARCHAR(30))))"
    s"""WITH keyed AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |         $okey AS okey
       |  FROM documents
       |), sharded AS (
       |  SELECT doc_id, n_tok, okey,
       |         CAST(${dkHexFold("okey", 12)} % $NShards AS INT) AS shard
       |  FROM keyed
       |), cums AS (
       |  SELECT shard, n_tok,
       |         CAST(sum(n_tok) OVER (PARTITION BY shard ORDER BY okey ASC, doc_id ASC
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM sharded
       |), placed AS (
       |  SELECT shard, n_tok, cum,
       |         CAST(floor(CAST(cum - n_tok AS DOUBLE) / $SeqLen) AS BIGINT) AS seq_first,
       |         CAST(floor(CAST(cum - 1 AS DOUBLE) / $SeqLen) AS BIGINT) AS seq_last
       |  FROM cums
       |)
       |SELECT shard, count(*) AS docs, CAST(sum(n_tok) AS BIGINT) AS tokens,
       |       CAST(floor(CAST(max(cum) + ${SeqLen - 1} AS DOUBLE) / $SeqLen) AS BIGINT) AS n_seqs,
       |       CAST(sum(CASE WHEN seq_first <> seq_last THEN 1 ELSE 0 END) AS BIGINT) AS split_docs
       |FROM placed GROUP BY shard ORDER BY shard ASC""".stripMargin
  }

  // ---- temperature mixture ------------------------------------------

  private val MixAlpha = 0.5
  private val MixTargetFrac = 0.3

  /** Per-source outcome of temperature resampling at alpha=0.5
    * targeting 30% of the corpus: candidates, keep rate (per-mille),
    * rows actually kept. */
  def mixTemperature(spark: SparkSession, dir: String): DataFrame =
    Curation.temperatureMix(Tables.documents(spark, dir), "source", "doc_id",
        MixAlpha, MixTargetFrac)
      .groupBy(col("source"), col("stratum_docs"), col("rate_pm"))
      .agg(count(lit(1)).as("kept"))
      .select(col("source"), col("stratum_docs").as("candidates"), col("rate_pm"), col("kept"))
      .orderBy(col("source").asc)

  private val mixTemperatureSql: String = {
    val frac = MixTargetFrac.toString
    s"""WITH cnt AS (
       |  SELECT source, count(*) AS c FROM documents GROUP BY 1
       |), tot AS (
       |  SELECT CAST(sum(c) AS BIGINT) AS n FROM cnt
       |), q AS (
       |  SELECT source, c, n,
       |         CAST(floor(sqrt(CAST(c AS DOUBLE) / n) * 1e9 + 0.5) AS BIGINT) AS q
       |  FROM cnt CROSS JOIN tot
       |), qs AS (
       |  SELECT CAST(sum(q) AS BIGINT) AS qsum FROM q
       |), rates AS (
       |  SELECT source, c,
       |         CAST(floor(least(1.0,
       |           (CAST(q AS DOUBLE) / qsum) * floor(CAST($frac AS DOUBLE) * n) / c) * 1000) AS BIGINT) AS rate_pm
       |  FROM q CROSS JOIN qs
       |)
       |SELECT d.source, r.c AS candidates, r.rate_pm, count(*) AS kept
       |FROM documents d JOIN rates r USING (source)
       |WHERE ((d.doc_id * 2654435761) % $P) % 1000 < r.rate_pm
       |GROUP BY 1, 2, 3
       |ORDER BY d.source ASC""".stripMargin
  }

  // ---- z-order layout cells -----------------------------------------

  private val ZBits = 8

  /** Morton-cell census of the events fact on (user bucket, day):
    * gates the interleave arithmetic end-to-end; the layout benefit
    * itself (bounded per-file rectangles) is asserted in ZOrderSpec. */
  def zorderCells(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .withColumn("x", pmod(col("user_id"), lit(256L)))
      .withColumn("y", dayofmonth(col("ts")).cast("long"))
    ev.withColumn("zval", ZOrder.zValue(col("x"), col("y"), ZBits))
      .withColumn("zcell", shiftright(col("zval"), 10))
      .groupBy(col("zcell"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("x_lo"), max(col("x")).as("x_hi"),
        min(col("y")).as("y_lo"), max(col("y")).as("y_hi"))
      .orderBy(col("zcell").asc)
  }

  /** DuckDB: the same unrolled Morton interleave [[ZOrder.zValue]]
    * emits (shared C bit semantics on int64). */
  private def dkZValue(a: String, b: String, bits: Int): String =
    (0 until bits).foldLeft("CAST(0 AS BIGINT)") { (acc, i) =>
      s"($acc | (($a & ${1L << i}) << $i) | (($b & ${1L << i}) << ${i + 1}))"
    }

  private val zorderCellsSql: String =
    s"""WITH dims AS (
       |  SELECT CAST(user_id % 256 AS BIGINT) AS x, CAST(day(ts) AS BIGINT) AS y
       |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
       |), z AS (
       |  SELECT x, y, (${dkZValue("x", "y", ZBits)} >> 10) AS zcell FROM dims
       |)
       |SELECT zcell, count(*) AS n_rows,
       |       min(x) AS x_lo, max(x) AS x_hi, min(y) AS y_lo, max(y) AS y_hi
       |FROM z GROUP BY zcell ORDER BY zcell ASC""".stripMargin

  /** READ-SIDE Z-order gate: write the events fact z-ordered on
    * (user bucket, day) via [[ZOrder.writeZOrdered]] into a scratch
    * layout, read it back through a 2-D predicate, and roll the
    * surviving rows up. The oracle computes the same predicate rollup
    * straight from the events table — if the layout round-trip loses,
    * duplicates, or corrupts ANY row (the failure mode a layout
    * rewrite can actually have), the hash flips. The layout's PRUNING
    * benefit (files/row-groups skipped vs a 1-D sort) is measured in
    * ZOrderSpec; this entry pins the correctness half: a clustering
    * rewrite must be result-invisible to readers. The driver-side
    * fetch is one rollup row (bounded), so the scratch layout can be
    * deleted before returning. */
  def zorderRead(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(
        pmod(col("user_id"), lit(256L)).as("x"),
        dayofmonth(col("ts")).cast("long").as("y"),
        col("event_id"), col("value"))
    // RAM-backed scratch (same rationale as the streaming gates): the
    // 16-file layout lives only for this query, so disk fsyncs are
    // pure overhead — the r6 bench's zorder_read ×2 drift was tmpdir
    // write latency, not plan cost
    val work = graft.sources.LocalFs.scratchDir("graft_zorder_read")
    // tmpfs scratch — leak on failure is leaked memory, so try/finally
    try {
      ZOrder.writeZOrdered(ev, "x", "y", bits = ZBits, targetFiles = 16, work.toString)
      val rollup = spark.read.parquet(work.toString)
        .filter(col("x").between(32, 47) && col("y").between(10, 19))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("event_id")).as("n_ids"),
          Cols.r(Cols.sumExact(col("value")), 2).as("total_value"),
          min(col("x")).as("x_lo"), max(col("x")).as("x_hi"),
          min(col("y")).as("y_lo"), max(col("y")).as("y_hi"))
      val settled = rollup.collect().toSeq
      spark.createDataFrame(
        spark.sparkContext.parallelize(settled, 1), rollup.schema)
    } finally graft.sources.LocalFs.deleteRecursively(work)
  }

  private val zorderReadSql: String =
    """WITH dims AS (
      |  SELECT CAST(user_id % 256 AS BIGINT) AS x, CAST(day(ts) AS BIGINT) AS y,
      |         event_id, value
      |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
      |)
      |SELECT count(*) AS n_rows, count(DISTINCT event_id) AS n_ids,
      |       floor(CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) * 1e2 + 0.5) / 1e2 AS total_value,
      |       min(x) AS x_lo, max(x) AS x_hi, min(y) AS y_lo, max(y) AS y_hi
      |FROM dims
      |WHERE x BETWEEN 32 AND 47 AND y BETWEEN 10 AND 19""".stripMargin

  /** ORC format round trip under the DuckDB gate: the events fact is
    * written DATE-PARTITIONED AS ORC ([[LayerWriter.writeFact]]'s
    * format twin of the parquet layout s13_fact_prune pins), read
    * back through a partition-pruning date range PLUS a row-level
    * value predicate (both must reach the OrcScan —
    * `OrcRoundtripSpec` pins PartitionFilters and PushedFilters), and
    * rolled up. The oracle computes the same rollup straight from the
    * events table: any row the ORC round trip loses, duplicates or
    * corrupts flips the hash — result-invisibility of the FORMAT,
    * the contract [[zorderRead]] pins for the layout rewrite. Scratch
    * is RAM-backed and deleted after the one-row-per-group settle. */
  def orcRoundtripRead(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.sources.LocalFs.scratchDir("graft_orc_fact")
    // scratch is tmpfs — a leaked dir is leaked MEMORY, so the whole
    // write/read/settle runs under try/finally
    try {
      graft.sources.LayerWriter.writeFact(
        Tables.events(spark, dir)
          .withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd")),
        work.toString, "event_date", format = "orc")
      val rollup = spark.read.orc(work.toString)
        .filter(col("event_date").between("2024-01-10", "2024-01-16")
          && col("value") > 10.0)
        .groupBy(date_format(col("event_date"), "yyyy-MM-dd").as("event_date"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          Cols.r(Cols.sumExact(col("value"), 2), 2).as("total_value"))
        .orderBy(col("event_date").asc, col("event_type").asc)
      val settled = rollup.collect().toSeq
      spark.createDataFrame(
        spark.sparkContext.parallelize(settled, 1), rollup.schema)
    } finally graft.sources.LocalFs.deleteRecursively(work)
  }

  private val orcRoundtripReadSql: String =
    """SELECT substr(CAST(ts AS VARCHAR(30)), 1, 10) AS event_date, event_type,
      |       count(*) AS n_events,
      |       count(DISTINCT user_id) AS n_users,
      |       floor(CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) * 1e2 + 0.5) / 1e2 AS total_value
      |FROM events
      |WHERE substr(CAST(ts AS VARCHAR(30)), 1, 10) BETWEEN '2024-01-10' AND '2024-01-16'
      |  AND value > 10.0
      |GROUP BY 1, 2
      |ORDER BY event_date ASC, event_type ASC""".stripMargin

  private val ChunkW = 6
  private val ChunkStride = 3

  /** Overlapping RAG chunk plan ([[graft.operators.Passages.withChunks]]
    * w = 6, stride = 3): per-source rollup of chunk counts, token
    * volume (with overlap — the storage cost of the chunk store) and
    * tail-aligned chunks. The chunker itself is one map-side explode;
    * the only shuffle is this bounded rollup. */
  def chunkPlan(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Passages.withChunks(
        Tables.documents(spark, dir).filter(col("text").isNotNull),
        w = ChunkW, stride = ChunkStride, keep = Seq("source"))
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum(col("chunk_tokens")).cast("long").as("sum_chunk_tokens"),
        sum(col("is_tail")).cast("long").as("n_tail_chunks"))
      .orderBy(col("source").asc)

  private val chunkPlanSql: String =
    s"""WITH c0 AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS t,
       |         len(string_split(text, ' ')) AS n
       |  FROM documents WHERE text IS NOT NULL
       |), st AS (
       |  SELECT doc_id, source, t, n,
       |         CASE WHEN n >= $ChunkW THEN
       |           CASE WHEN (n - $ChunkW) % $ChunkStride <> 0
       |                THEN list_append(list_transform(
       |                       generate_series(0, CAST(floor((n - $ChunkW) / $ChunkStride.0) AS BIGINT)),
       |                       i -> i * $ChunkStride), CAST(n - $ChunkW AS BIGINT))
       |                ELSE list_transform(
       |                       generate_series(0, CAST(floor((n - $ChunkW) / $ChunkStride.0) AS BIGINT)),
       |                       i -> i * $ChunkStride) END
       |         WHEN n > 0 THEN list_transform(generate_series(0, 0), i -> CAST(0 AS BIGINT))
       |         ELSE list_filter(list_transform(generate_series(0, 0),
       |                i -> CAST(0 AS BIGINT)), x -> false) END AS starts
       |  FROM c0
       |), ck AS (
       |  SELECT doc_id, source, unnest(starts) AS s0, t FROM st
       |), cr AS (
       |  SELECT doc_id, source,
       |         CAST(len(list_slice(t, s0 + 1, s0 + $ChunkW)) AS BIGINT) AS n_ctoks,
       |         CASE WHEN s0 % $ChunkStride <> 0 THEN 1 ELSE 0 END AS tail
       |  FROM ck
       |)
       |SELECT source,
       |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |       CAST(count(*) AS BIGINT) AS n_chunks,
       |       CAST(sum(n_ctoks) AS BIGINT) AS sum_chunk_tokens,
       |       CAST(sum(tail) AS BIGINT) AS n_tail_chunks
       |FROM cr GROUP BY 1 ORDER BY source ASC""".stripMargin

  // ---- catalog wiring -----------------------------------------------

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "chunk_plan" -> (chunkPlan _),
    "orc_roundtrip_read" -> (orcRoundtripRead _),
    "shard_plan"  -> (shardPlan _),
    "contam_pairs" -> (contamPairs _),
    "contam_scrub" -> (contamScrub _),
    "bm25_probe"  -> (bm25Probe _),
    "hybrid_rrf"  -> (hybridRrf _),
    "sim_topk_q8" -> (simTopKQ8 _),
    "pack_plan"   -> (packPlan _),
    "mix_temperature" -> (mixTemperature _),
    "zorder_cells" -> (zorderCells _),
    "zorder_read" -> (zorderRead _)
  )

  val oracles: Map[String, String] = Map(
    "chunk_plan" -> chunkPlanSql,
    "orc_roundtrip_read" -> orcRoundtripReadSql,
    "shard_plan"  -> shardPlanSql,
    "contam_pairs" -> contamPairsSql,
    "contam_scrub" -> contamScrubSql,
    "bm25_probe"  -> bm25ProbeSql,
    "hybrid_rrf"  -> hybridRrfSql,
    "sim_topk_q8" -> simTopKQ8Sql,
    "pack_plan"   -> packPlanSql,
    "mix_temperature" -> mixTemperatureSql,
    "zorder_cells" -> zorderCellsSql,
    "zorder_read" -> zorderReadSql
  )
}
