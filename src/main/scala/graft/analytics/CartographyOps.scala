package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.operators.{Cartography, Relevance, TextDedup}

/** Dataset-cartography catalog entries: TF-IDF retrieval (the
  * classic lexical scorer beside bm25_probe), the per-source n-gram
  * rarity histogram, and per-label embedding cohesion — corpus QA
  * surfaces a training-data pipeline reads before deciding what to
  * keep (SURVEY.md §7.4 north-star extensions; same oracle contract
  * as [[DataOps]]/[[CorpusOps]]: every cross-engine sum is exact
  * integer arithmetic, every transcendental is micro-quantized at
  * the row it is produced).
  */
object CartographyOps {

  private val P = TextDedup.P

  // Same probe as bm25_probe, so the two scorers are directly
  // comparable on the same query (rare + mid + common term).
  private val TfidfTerms = Seq("dup", "vector", "hash")
  private val TfidfK = 15

  /** Top-15 docs for the mixed probe under log-tf·idf TF-IDF. */
  def tfidfTopK(spark: SparkSession, dir: String): DataFrame =
    Relevance.tfidfTopK(Tables.documents(spark, dir), TfidfTerms, TfidfK)

  private val tfidfTopKSql: String = {
    val terms = TfidfTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM toks
       |  WHERE term IN ($terms) GROUP BY 1, 2
       |), dfreq AS (
       |  SELECT term, count(*) AS df FROM tf GROUP BY 1
       |), stats AS (
       |  SELECT count(*) AS n_docs FROM documents
       |), scored AS (
       |  SELECT tf.doc_id,
       |         CAST(floor((1.0 + ln(CAST(tf AS DOUBLE)))
       |           * ln(CAST(n_docs AS DOUBLE) / df) * 1e6 + 0.5) AS BIGINT) AS tq
       |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
       |), tdoc AS (
       |  SELECT doc_id, CAST(sum(tq) AS DOUBLE) / 1e6 AS score
       |  FROM scored GROUP BY 1
       |)
       |SELECT doc_id, score FROM tdoc
       |ORDER BY score DESC, doc_id ASC LIMIT $TfidfK""".stripMargin
  }

  /** Per-(source, decile) rarity histogram over 3-gram shingles. */
  def rarityProfile(spark: SparkSession, dir: String): DataFrame =
    Cartography.rarityProfile(Tables.documents(spark, dir), n = 3)

  // The char-fold / shingle mirrors below replay TextDedup's portable
  // hash family (same fragments as DataOps' dedup oracles).
  private def dkWordHash(w: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(generate_series(1, greatest(length($w), 1)), " +
      s"i -> CAST(ascii(substr($w, i, 1)) AS BIGINT))), (acc, x) -> (acc * 31 + x) % $P)"

  private val dkShingles3 =
    s"""CASE WHEN len(th) < 3 THEN list_slice(th, 1, 0) ELSE
       |  list_distinct(list_transform(generate_series(1, len(th) - 2),
       |    i -> list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(th, i, i + 2)),
       |         (acc, h) -> (acc * 131 + h) % $P))) END""".stripMargin

  private val rarityProfileSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, source,
       |         list_transform(string_split(text, ' '), w -> ${dkWordHash("w")}) AS th
       |  FROM documents
       |), sh AS (
       |  SELECT doc_id, source, unnest($dkShingles3) AS sh FROM tok
       |), dfr AS (
       |  SELECT sh, count(*) AS df FROM sh GROUP BY 1
       |), perdoc AS (
       |  SELECT s.doc_id, s.source, count(*) AS n_sh,
       |         CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
       |  FROM sh s JOIN dfr d USING (sh)
       |  GROUP BY 1, 2
       |)
       |SELECT source, CAST(floor(floor(n_unique * 1000.0 / n_sh) / 100.0) AS BIGINT) AS bucket,
       |       count(*) AS n_docs,
       |       CAST(sum(n_sh) AS BIGINT) AS sum_sh,
       |       CAST(sum(n_unique) AS BIGINT) AS sum_unique
       |FROM perdoc
       |GROUP BY 1, 2
       |ORDER BY source ASC, bucket ASC""".stripMargin

  /** Per-label embedding centroid norm + cohesion. */
  def embedLabelCentroids(spark: SparkSession, dir: String): DataFrame =
    Cartography.labelCentroids(Tables.embeddings(spark, dir))

  private val embedLabelCentroidsSql: String =
    """WITH ex AS (
      |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
      |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS v
      |  FROM embeddings
      |  WHERE embedding IS NOT NULL AND len(embedding) > 0
      |), cent AS (
      |  SELECT label, pos, CAST(sum(v) AS BIGINT) AS s FROM ex GROUP BY 1, 2
      |), labstats AS (
      |  SELECT label, sum(CAST(s AS HUGEINT) * CAST(s AS HUGEINT)) AS n2s
      |  FROM cent GROUP BY 1
      |), rowdots AS (
      |  SELECT e.vec_id, e.label,
      |         sum(CAST(e.v AS HUGEINT) * CAST(c.s AS HUGEINT)) AS num,
      |         CAST(sum(e.v * e.v) AS BIGINT) AS n2v
      |  FROM ex e JOIN cent c ON e.label = c.label AND e.pos = c.pos
      |  GROUP BY 1, 2
      |), mcs AS (
      |  SELECT r.vec_id, r.label,
      |         CAST(floor(CASE WHEN r.n2v > 0 AND l.n2s > 0
      |           THEN CAST(r.num AS DOUBLE)
      |                  / (sqrt(CAST(r.n2v AS DOUBLE)) * sqrt(CAST(l.n2s AS DOUBLE)))
      |           ELSE 0.0 END * 1e6 + 0.5) AS BIGINT) AS mc
      |  FROM rowdots r JOIN labstats l USING (label)
      |), byl AS (
      |  SELECT label, count(*) AS n_vecs, CAST(sum(mc) AS BIGINT) AS sum_mc
      |  FROM mcs GROUP BY 1
      |)
      |SELECT b.label, b.n_vecs,
      |       CAST(floor(sqrt(CAST(l.n2s AS DOUBLE)) / b.n_vecs + 0.5) AS BIGINT)
      |         AS centroid_norm_micro,
      |       CAST(floor(CAST(b.sum_mc AS DOUBLE) / b.n_vecs + 0.5) AS BIGINT)
      |         AS cohesion_micro
      |FROM byl b JOIN labstats l USING (label)
      |ORDER BY label ASC""".stripMargin

  /** Theil–Sen Zipf fit over the top-256 word-frequency head. */
  def zipfSlope(spark: SparkSession, dir: String): DataFrame =
    Cartography.zipfSlope(Tables.documents(spark, dir), topRanks = 256)

  private val zipfSlopeSql: String =
    """WITH freqs AS (
      |  SELECT w, cnt FROM (
      |    SELECT w, CAST(count(*) AS BIGINT) AS cnt
      |    FROM (SELECT unnest(string_split(text, ' ')) AS w
      |          FROM documents WHERE text IS NOT NULL)
      |    WHERE w <> '' GROUP BY 1)
      |  ORDER BY cnt DESC, w ASC LIMIT 256
      |), rkd AS (
      |  SELECT cnt, CAST(row_number() OVER (ORDER BY cnt DESC, w ASC) AS BIGINT) AS rk
      |  FROM freqs
      |), pts AS (
      |  SELECT rk, ln(CAST(rk AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y FROM rkd
      |), pairs AS (
      |  SELECT a.rk AS rk_a, b.rk AS rk_b,
      |         CAST(floor((b.y - a.y) / (b.x - a.x) * 1e6 + 0.5) AS BIGINT) AS slope_q
      |  FROM pts a JOIN pts b ON a.rk < b.rk
      |), sm AS (SELECT count(*) AS m FROM pairs),
      |sr AS (
      |  SELECT slope_q, row_number() OVER (ORDER BY slope_q ASC, rk_a ASC, rk_b ASC) AS prk
      |  FROM pairs
      |), smed AS (
      |  SELECT min(CASE WHEN prk = CAST(floor(CAST(m + 1 AS DOUBLE) / 2.0) AS BIGINT)
      |                  THEN slope_q END) AS slope_micro,
      |         max(m) AS m
      |  FROM sr, sm
      |), nr AS (SELECT count(*) AS n_ranks FROM pts),
      |res AS (
      |  SELECT rk,
      |         CAST(floor((y - CAST(slope_micro AS DOUBLE) / 1e6 * x) * 1e6 + 0.5) AS BIGINT) AS icept_q
      |  FROM pts, smed
      |), rr AS (
      |  SELECT icept_q, row_number() OVER (ORDER BY icept_q ASC, rk ASC) AS prk FROM res
      |), imed AS (
      |  SELECT min(CASE WHEN prk = CAST(floor(CAST(n_ranks + 1 AS DOUBLE) / 2.0) AS BIGINT)
      |                  THEN icept_q END) AS intercept_micro
      |  FROM rr, nr
      |)
      |SELECT CAST(n_ranks AS BIGINT) AS n_ranks, CAST(m AS BIGINT) AS n_pairs,
      |       slope_micro, intercept_micro
      |FROM nr, smed, imed""".stripMargin

  /** Top-3 distinguishing terms per source under source-level TF-IDF. */
  def keywordsPerSource(spark: SparkSession, dir: String): DataFrame =
    Cartography.keywordsPerSource(Tables.documents(spark, dir), k = 3)

  private val keywordsPerSourceSql: String =
    """WITH tf AS (
      |  SELECT source, term, CAST(count(*) AS BIGINT) AS tf
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS term
      |        FROM documents WHERE text IS NOT NULL)
      |  WHERE term <> '' GROUP BY 1, 2
      |), dfr AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |ns AS (SELECT CAST(count(DISTINCT source) AS BIGINT) AS n_sources FROM tf),
      |scored AS (
      |  SELECT tf.source, tf.term,
      |         CAST(floor((1.0 + ln(CAST(tf AS DOUBLE)))
      |           * ln(CAST(n_sources AS DOUBLE) / df) * 1e6 + 0.5) AS BIGINT) AS score_micro
      |  FROM tf JOIN dfr USING (term) CROSS JOIN ns
      |), rnk AS (
      |  SELECT source, term, score_micro,
      |         CAST(row_number() OVER (PARTITION BY source
      |           ORDER BY score_micro DESC, term ASC) AS BIGINT) AS rk
      |  FROM scored
      |)
      |SELECT source, rk, term, score_micro FROM rnk WHERE rk <= 3
      |ORDER BY source ASC, rk ASC""".stripMargin

  /** Per-source character-entropy histogram (0.25-nat buckets). */
  def entropyProfile(spark: SparkSession, dir: String): DataFrame =
    Cartography.charEntropyProfile(Tables.documents(spark, dir))

  private val entropyProfileSql: String =
    """WITH ch0 AS (
      |  SELECT doc_id, source, text, length(text) AS nt,
      |         unnest(generate_series(1, CAST(length(text) AS BIGINT))) AS i
      |  FROM documents WHERE text IS NOT NULL AND length(text) > 0
      |), cnt AS (
      |  SELECT doc_id, source, nt, substr(text, i, 1) AS ch, count(*) AS n
      |  FROM ch0 GROUP BY 1, 2, 3, 4
      |), pd AS (
      |  SELECT doc_id, source,
      |         CAST(sum(CAST(floor(-((CAST(n AS DOUBLE) / nt) * ln(CAST(n AS DOUBLE) / nt))
      |           * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS h9
      |  FROM cnt
      |  GROUP BY 1, 2
      |)
      |SELECT source, CAST(floor(h9 / 250000000.0) AS BIGINT) AS bucket,
      |       count(*) AS n_docs, CAST(sum(h9) AS BIGINT) AS sum_h9
      |FROM pd GROUP BY 1, 2
      |ORDER BY source ASC, bucket ASC""".stripMargin

  /** Distinct-1/2/3 diversity per source. */
  def diversityDistinctN(spark: SparkSession, dir: String): DataFrame =
    Cartography.distinctNgramDiversity(Tables.documents(spark, dir))

  private val diversityDistinctNSql: String =
    """WITH tk0 AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS ws
      |  FROM documents WHERE text IS NOT NULL
      |), tk AS (
      |  SELECT doc_id, source,
      |         unnest(generate_series(1, CAST(len(ws) AS BIGINT))) AS pos, ws
      |  FROM tk0
      |), tw AS (
      |  SELECT doc_id, source, pos, list_extract(ws, pos) AS w
      |  FROM tk WHERE list_extract(ws, pos) <> ''
      |), led AS (
      |  SELECT doc_id, source, w,
      |         lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w1,
      |         lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      |  FROM tw
      |), gr AS (
      |  SELECT source, CAST(1 AS BIGINT) AS n, w AS gram FROM led
      |  UNION ALL
      |  SELECT source, 2, w || ' ' || w1 FROM led WHERE w1 IS NOT NULL
      |  UNION ALL
      |  SELECT source, 3, w || ' ' || w1 || ' ' || w2 FROM led WHERE w2 IS NOT NULL
      |)
      |SELECT source, n, count(*) AS n_total,
      |       CAST(count(DISTINCT gram) AS BIGINT) AS n_distinct,
      |       CAST(floor(CAST(count(DISTINCT gram) AS DOUBLE) / count(*) * 1e6 + 0.5)
      |            AS BIGINT) AS ratio_micro
      |FROM gr GROUP BY 1, 2
      |ORDER BY source ASC, n ASC""".stripMargin

  /** Top-20 burstiest words (Church–Gale VMR), df ≥ 5. */
  def burstinessTopK(spark: SparkSession, dir: String): DataFrame =
    Cartography.burstinessTopK(Tables.documents(spark, dir), k = 20, minDf = 5)

  private val burstinessTopKSql: String =
    """WITH base AS (
      |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
      |), dd AS (SELECT count(*) AS d FROM base),
      |pc AS (
      |  SELECT doc_id, w, count(*) AS c
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM base)
      |  WHERE w <> '' GROUP BY 1, 2
      |), wstats AS (
      |  SELECT w, count(*) AS df,
      |         CAST(sum(c) AS BIGINT) AS total,
      |         CAST(sum(c * c) AS BIGINT) AS sumsq
      |  FROM pc GROUP BY 1 HAVING count(*) >= 5
      |), sc AS (
      |  SELECT w AS word, df, total,
      |         CAST(floor((CAST(sumsq AS DOUBLE) / d / (CAST(total AS DOUBLE) / d)
      |           - CAST(total AS DOUBLE) / d) * 1e6 + 0.5) AS BIGINT) AS vmr_micro
      |  FROM wstats, dd
      |)
      |SELECT word, df, total, vmr_micro FROM sc
      |ORDER BY vmr_micro DESC, word ASC LIMIT 20""".stripMargin

  /** Per-source corpus mix with cumulative concentration. */
  def sourceMixSummary(spark: SparkSession, dir: String): DataFrame =
    Cartography.sourceMixSummary(Tables.documents(spark, dir))

  private val sourceMixSummarySql: String =
    """WITH ps AS (
      |  SELECT source, count(*) AS n_docs,
      |         CAST(sum(len(list_filter(string_split(text, ' '), w -> w <> ''))) AS BIGINT) AS n_tokens,
      |         CAST(sum(length(text)) AS BIGINT) AS n_chars
      |  FROM documents WHERE text IS NOT NULL
      |  GROUP BY 1
      |), tt AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t_tokens FROM ps),
      |cm AS (
      |  SELECT source, n_docs, n_tokens, n_chars,
      |         sum(n_tokens) OVER (ORDER BY n_tokens DESC, source ASC
      |                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
      |  FROM ps
      |)
      |SELECT c.source, c.n_docs, c.n_tokens, c.n_chars,
      |       CAST(floor(CAST(c.n_tokens AS DOUBLE) / t.t_tokens * 1e6 + 0.5) AS BIGINT)
      |         AS share_micro,
      |       CAST(floor(CAST(c.cum_tokens AS DOUBLE) / t.t_tokens * 1e6 + 0.5) AS BIGINT)
      |         AS cum_share_micro
      |FROM cm c, tt t
      |ORDER BY c.n_tokens DESC, c.source ASC""".stripMargin

  // ---- catalog wiring -----------------------------------------------

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tfidf_topk" -> (tfidfTopK _),
    "rarity_profile" -> (rarityProfile _),
    "embed_label_centroids" -> (embedLabelCentroids _),
    "zipf_slope" -> (zipfSlope _),
    "keywords_per_source" -> (keywordsPerSource _),
    "entropy_profile" -> (entropyProfile _),
    "diversity_distinct_n" -> (diversityDistinctN _),
    "burstiness_topk" -> (burstinessTopK _),
    "source_mix_summary" -> (sourceMixSummary _)
  )

  val oracles: Map[String, String] = Map(
    "tfidf_topk" -> tfidfTopKSql,
    "rarity_profile" -> rarityProfileSql,
    "embed_label_centroids" -> embedLabelCentroidsSql,
    "zipf_slope" -> zipfSlopeSql,
    "keywords_per_source" -> keywordsPerSourceSql,
    "entropy_profile" -> entropyProfileSql,
    "diversity_distinct_n" -> diversityDistinctNSql,
    "burstiness_topk" -> burstinessTopKSql,
    "source_mix_summary" -> sourceMixSummarySql
  )
}
