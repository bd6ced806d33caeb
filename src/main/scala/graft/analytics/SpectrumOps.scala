package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Pca

/** Embedding-spectrum catalog entries: the corpus' top principal
  * component by power iteration and the all-but-the-top correction
  * rolled up per label ([[graft.operators.Pca]]). The DuckDB oracles
  * replay the WHOLE training loop — exact integer moments, the
  * truncating N² normalization, and all [[Rounds]] iteration steps as
  * unrolled list_reduce chains (the classifier-oracle construction,
  * with IEEE-exact +,×,÷,sqrt only) — then the application pass.
  */
object SpectrumOps {

  /** Embedding dimensionality of the harness corpus. */
  val Dim = 64

  /** Fixed power-iteration rounds (unrolled in the oracle). */
  val Rounds = 12

  // keyed by (dir, slice-tag): "" = full corpus, "even"/"odd" = the
  // stability halves — every fit is once-per-corpus state
  private val pcaMemo =
    new scala.collection.concurrent.TrieMap[(String, String), (Pca.Moments, Array[Double])]()

  /** Actual fit executions — lets `TrainMemoSpec` pin the
    * one-moment-pass-per-corpus claim (the embCountJobs pattern). */
  private[graft] val pcaFitRuns = new java.util.concurrent.atomic.AtomicInteger(0)

  private def fittedSlice(spark: SparkSession, dir: String, tag: String,
      slice: DataFrame => DataFrame): (Pca.Moments, Array[Double]) =
    pcaMemo.getOrElseUpdate((dir, tag), {
      pcaFitRuns.incrementAndGet()
      Pca.fit(slice(Tables.embeddings(spark, dir)), Dim, Rounds)
    })

  private def fitted(spark: SparkSession, dir: String): (Pca.Moments, Array[Double]) =
    fittedSlice(spark, dir, "", identity)

  /** Top principal direction, micro-quantized: (pos, loading_micro). */
  def embedPcaTop(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (_, u) = fitted(spark, dir)
    spark.createDataset((1 to Dim).map(p =>
        (p.toLong, math.floor(u(p - 1) * Pca.Micro + 0.5).toLong)))
      .toDF("pos", "loading_micro")
      .orderBy(col("pos").asc)
  }

  /** All-but-the-top application rolled up per label. */
  def embedAbttLabels(spark: SparkSession, dir: String): DataFrame = {
    val (mom, u) = fitted(spark, dir)
    Pca.abttLabelStats(Tables.embeddings(spark, dir), Dim, mom, u)
  }

  // ---- oracle SQL ----------------------------------------------------

  private def dkDot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(list_zip($a, $b), " +
      s"x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), (acc, v) -> acc + v)"

  /** One power-iteration round: y = Ĝv (per-row ascending-j fold),
    * ‖y‖ from the ascending-i fold, v ← y/‖y‖ (zero vector if the
    * norm is zero — constant corpus). */
  private def dkPowerRound(r: Int): String = dkPowerRoundP("", r)

  private def dkPowerRoundP(px: String, r: Int): String =
    s"""${px}y$r AS (
       |  SELECT g.i, ${dkDot("g.grow", "pv.v")} AS y
       |  FROM ${px}gmat g, ${px}v${r - 1} pv
       |), ${px}yl$r AS (SELECT list(y ORDER BY i) AS yl FROM ${px}y$r),
       |${px}n$r AS (SELECT sqrt(${dkDot("yl", "yl")}) AS nrm FROM ${px}yl$r),
       |${px}v$r AS MATERIALIZED (
       |  SELECT CASE WHEN nm.nrm > 0
       |              THEN list_transform(yl, t -> t / nm.nrm)
       |              ELSE list_transform(yl, t -> CAST(0 AS DOUBLE)) END AS v
       |  FROM ${px}yl$r, ${px}n$r nm
       |)""".stripMargin

  /** Shared prefix: quantized components, exact moments, the
    * truncating-÷N² scatter matrix as per-row lists, the all-ones
    * start vector, and all [[Rounds]] unrolled iteration rounds
    * ending in v[[Rounds]]. */
  private lazy val dkPcaCtes: String = dkPcaCtesP("", "TRUE")

  private def dkPcaCtesP(px: String, filter: String): String =
    s"""${px}ex AS MATERIALIZED (
       |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
       |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS v
       |  FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(embedding) = $Dim AND $filter
       |), ${px}st AS MATERIALIZED (
       |  SELECT pos, CAST(sum(v) AS HUGEINT) AS s, count(*) AS nrows FROM ${px}ex GROUP BY 1
       |), ${px}nn AS (SELECT CAST(coalesce(max(nrows), 0) AS HUGEINT) AS n FROM ${px}st),
       |${px}mom AS MATERIALIZED (
       |  SELECT a.pos AS i, b.pos AS j,
       |         CAST(sum(CAST(a.v AS HUGEINT) * CAST(b.v AS HUGEINT)) AS HUGEINT) AS m
       |  FROM ${px}ex a JOIN ${px}ex b ON a.vec_id = b.vec_id AND a.pos <= b.pos
       |  GROUP BY 1, 2
       |), ${px}gfull AS (
       |  SELECT i, j, m FROM ${px}mom
       |  UNION ALL
       |  SELECT j, i, m FROM ${px}mom WHERE i < j
       |), ${px}gmat AS MATERIALIZED (
       |  SELECT i, list(gd ORDER BY j) AS grow FROM (
       |    SELECT g.i, g.j,
       |           CAST(((SELECT n FROM ${px}nn) * g.m - si.s * sj.s)
       |                // ((SELECT n FROM ${px}nn) * (SELECT n FROM ${px}nn)) AS DOUBLE) AS gd
       |    FROM ${px}gfull g
       |    JOIN ${px}st si ON si.pos = g.i
       |    JOIN ${px}st sj ON sj.pos = g.j)
       |  GROUP BY 1
       |), ${px}v0 AS (
       |  SELECT list_transform(generate_series(1, $Dim), x -> CAST(1 AS DOUBLE)) AS v
       |), ${(1 to Rounds).map(dkPowerRoundP(px, _)).mkString(",\n")}""".stripMargin

  private lazy val embedPcaTopSql: String =
    s"""WITH $dkPcaCtes
       |SELECT CAST(pos AS BIGINT) AS pos,
       |       CAST(floor((SELECT v FROM v$Rounds)[pos] * 1e6 + 0.5) AS BIGINT) AS loading_micro
       |FROM (SELECT unnest(generate_series(1, $Dim)) AS pos)
       |ORDER BY pos ASC""".stripMargin

  private lazy val embedAbttLabelsSql: String =
    s"""WITH $dkPcaCtes,
       |qv AS (
       |  SELECT vec_id, label, list(v ORDER BY pos) AS q FROM ex GROUP BY 1, 2
       |), sl AS (SELECT list(s ORDER BY pos) AS sv FROM st),
       |cdv AS (
       |  SELECT vec_id, label,
       |         list_transform(list_zip(q, sl.sv),
       |           x -> CAST(CAST(x[1] AS HUGEINT) * nn.n - CAST(x[2] AS HUGEINT) AS DOUBLE)
       |                / CAST(nn.n AS DOUBLE)) AS cd
       |  FROM qv, sl, nn
       |), proj AS (
       |  SELECT vec_id, label,
       |         ${dkDot("cd", "fv.v")} AS p,
       |         ${dkDot("cd", "cd")} AS cn2
       |  FROM cdv, v$Rounds fv
       |), rowq AS (
       |  SELECT label,
       |         CAST(floor(abs(p) * 1e6 + 0.5) AS BIGINT) AS pm,
       |         CAST(floor(CASE WHEN cn2 > 0 THEN 1e0 - p * p / cn2 ELSE 0e0 END
       |                    * 1e6 + 0.5) AS BIGINT) AS rsm
       |  FROM proj
       |)
       |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       |       CAST(floor(CAST(sum(pm) AS DOUBLE) / count(*) + 0.5) AS BIGINT)
       |         AS mean_abs_proj_micro,
       |       CAST(floor(CAST(sum(rsm) AS DOUBLE) / count(*) + 0.5) AS BIGINT)
       |         AS mean_resid_share_micro
       |FROM rowq GROUP BY 1 ORDER BY label ASC""".stripMargin

  /** Embedding-space stability: the top principal direction fitted
    * independently on the even and odd vec_id halves, compared by
    * their dot product (|align| near 1 = the halves agree on the
    * dominant direction; the spectral twin of the tokenizer's
    * bpe_stability). Signs are deterministic (both iterations start
    * from the all-ones vector), so the raw signed dot is itself a
    * stable, gateable number. */
  def embedPcaStability(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (me, ue) = fittedSlice(spark, dir, "even",
      _.filter(pmod(col("vec_id"), lit(2)) === 0))
    val (mo, uo) = fittedSlice(spark, dir, "odd",
      _.filter(pmod(col("vec_id"), lit(2)) === 1))
    var dot = 0.0
    var i = 0
    while (i < Dim) { dot += ue(i) * uo(i); i += 1 }
    spark.createDataset(Seq((me.n, mo.n, math.floor(dot * 1e6 + 0.5).toLong)))
      .toDF("n_even", "n_odd", "align_micro")
  }

  private lazy val embedPcaStabilitySql: String =
    s"""WITH ${dkPcaCtesP("ev", "vec_id % 2 = 0")},
       |${dkPcaCtesP("od", "vec_id % 2 = 1")},
       |ne AS (SELECT CAST(coalesce(max(nrows), 0) AS BIGINT) AS n_even FROM evst),
       |no AS (SELECT CAST(coalesce(max(nrows), 0) AS BIGINT) AS n_odd FROM odst)
       |SELECT ne.n_even, no.n_odd,
       |       CAST(floor(${dkDot("a.v", "b.v")} * 1e6 + 0.5) AS BIGINT) AS align_micro
       |FROM evv$Rounds a, odv$Rounds b, ne, no""".stripMargin

  // ---- catalog wiring -----------------------------------------------

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_pca_top" -> (embedPcaTop _),
    "embed_abtt_labels" -> (embedAbttLabels _),
    "embed_pca_stability" -> (embedPcaStability _)
  )

  val oracles: Map[String, String] = Map(
    "embed_pca_top" -> embedPcaTopSql,
    "embed_abtt_labels" -> embedAbttLabelsSql,
    "embed_pca_stability" -> embedPcaStabilitySql
  )
}
