package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Bpe

/** Tokenizer-training catalog entries: BPE merge learning over the
  * corpus word-frequency dictionary and its application back to the
  * corpus (SURVEY.md §7.4 north-star extensions — the tokenizer is
  * the first artifact a training-data pipeline derives from a frozen
  * corpus). Pure integer arithmetic end-to-end, so the DuckDB oracle
  * replays the ENTIRE training loop: each merge round is an unrolled
  * CTE chain (pair count → deterministic argmax → run-parity greedy
  * application), the same construction as the classifier oracle's
  * unrolled gradient steps ([[DataOps]] dkClfIter).
  *
  * The trained artifact is memoized per corpus dir (the
  * [[DataOps]] centroid-memo pattern): a real deployment stores the
  * merge table next to the data; here the three entries and repeat
  * bench passes share one training run.
  */
object TokenizerOps {

  /** Merge rounds trained (and unrolled in the oracle). */
  val Rounds = 8

  // Keyed by (session, dir), NOT dir alone: the cached seqs frame is
  // session-bound (the distributed path returns a localCheckpoint-
  // backed frame), so a memo surviving a SparkSession restart would
  // hand back a frame whose blocks are gone. A new session re-trains;
  // within a session the one-run-per-corpus contract (TrainMemoSpec)
  // holds. Unlike centroidMemo/embCountMemo this memo cannot be made
  // session-free without collecting the dict-sized seqs to the driver,
  // which the >DriverWordLimit distributed path exists to avoid.
  private val bpeMemo =
    new scala.collection.concurrent.TrieMap[(SparkSession, String), (Seq[Bpe.Merge], DataFrame)]()

  /** Actual training executions — lets `TrainMemoSpec` pin the
    * one-training-run-per-corpus claim (the embCountJobs pattern). */
  private[graft] val bpeTrainRuns = new java.util.concurrent.atomic.AtomicInteger(0)

  private def trained(spark: SparkSession, dir: String): (Seq[Bpe.Merge], DataFrame) = {
    // evict entries owned by stopped sessions: their cached /
    // localCheckpoint-backed frames are unusable anyway, and keeping
    // the key would strongly retain every dead SparkSession (and its
    // seqs frame) forever under session churn
    bpeMemo.keySet.foreach { key =>
      if (key._1.sparkContext.isStopped) bpeMemo.remove(key)
    }
    bpeMemo.getOrElseUpdate((spark, dir), {
      bpeTrainRuns.incrementAndGet()
      val dict = Bpe.wordDict(Tables.documents(spark, dir))
      Bpe.train(dict, Rounds)
    })
  }

  /** The ordered merge list — the tokenizer itself. */
  def bpeMerges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (merges, _) = trained(spark, dir)
    spark.createDataset(merges)
      .toDF("merge_round", "sym_left", "sym_right", "pair_count")
      .orderBy(col("merge_round").asc)
  }

  /** Final symbol inventory after [[Rounds]] merges. */
  def bpeVocab(spark: SparkSession, dir: String): DataFrame =
    Bpe.vocab(trained(spark, dir)._2)

  /** The trained tokenizer applied back to the corpus: per-source
    * document/word/subtoken totals (the "how many tokens is this
    * corpus" question every training run starts with). The dict-sized
    * word→subtoken-count map joins the corpus word stream on its key;
    * at harness scale AQE broadcasts it, at 100 TB it shuffle-joins. */
  def bpeSubtokenStats(spark: SparkSession, dir: String): DataFrame = {
    val (_, seqs) = trained(spark, dir)
    val wmap = seqs.select(col("word"), size(col("seq")).cast("long").as("n_sub"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .join(wmap, col("w") === col("word"))
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_words"),
        sum(col("n_sub")).cast("long").as("n_subtokens"))
      .orderBy(col("source").asc)
  }

  // ---- oracle SQL ----------------------------------------------------

  /** One unrolled merge round: pair count with overlaps (the textbook
    * get_stats), argmax by (c DESC, a, b), hit positions, greedy
    * overlap resolution by run parity (consecutive hits require
    * a = b; keep even offsets from each run start), rebuild. Scalar
    * subqueries against b{i} are NULL on an exhausted dict, turning
    * every remaining round into the identity — matching the engine's
    * early stop. */
  private def dkBpeRound(i: Int): String = dkBpeRoundP("", i)

  private def dkBpeRoundP(px: String, i: Int): String =
    s"""${px}e$i AS (
       |  SELECT word, cnt, unnest(generate_series(1, CAST(len(seq) - 1 AS BIGINT))) AS j, seq
       |  FROM ${px}s${i - 1} WHERE len(seq) >= 2
       |), ${px}p$i AS (
       |  SELECT seq[j] AS a, seq[j + 1] AS b, CAST(sum(cnt) AS BIGINT) AS c
       |  FROM ${px}e$i GROUP BY 1, 2
       |), ${px}b$i AS (
       |  SELECT a, b, c FROM ${px}p$i ORDER BY c DESC, a ASC, b ASC LIMIT 1
       |), ${px}h$i AS (
       |  SELECT word, j FROM ${px}e$i
       |  WHERE seq[j] = (SELECT a FROM ${px}b$i) AND seq[j + 1] = (SELECT b FROM ${px}b$i)
       |), ${px}r$i AS (
       |  SELECT word, j, j - row_number() OVER (PARTITION BY word ORDER BY j) AS grp
       |  FROM ${px}h$i
       |), ${px}k$i AS MATERIALIZED (
       |  SELECT word AS kw, j AS kj FROM (
       |    SELECT word, j, min(j) OVER (PARTITION BY word, grp) AS j0 FROM ${px}r$i)
       |  WHERE (j - j0) % 2 = 0
       |), ${px}f$i AS (
       |  SELECT word, cnt, unnest(generate_series(1, CAST(len(seq) AS BIGINT))) AS pos, seq
       |  FROM ${px}s${i - 1}
       |), ${px}n$i AS (
       |  SELECT f.word, f.cnt, f.pos,
       |         CASE WHEN k.kj IS NOT NULL THEN f.seq[f.pos] || f.seq[f.pos + 1]
       |              ELSE f.seq[f.pos] END AS sym
       |  FROM ${px}f$i f
       |  LEFT JOIN ${px}k$i k ON k.kw = f.word AND k.kj = f.pos
       |  LEFT JOIN ${px}k$i c ON c.kw = f.word AND c.kj = f.pos - 1
       |  WHERE c.kj IS NULL
       |), ${px}s$i AS MATERIALIZED (
       |  SELECT word, cnt, list(sym ORDER BY pos) AS seq FROM ${px}n$i GROUP BY 1, 2
       |)""".stripMargin

  /** Shared prefix: word-frequency dict, char+marker init, all
    * [[Rounds]] unrolled rounds. `px` prefixes every CTE name and
    * `filter` restricts the corpus — the stability oracle chains two
    * independent trainings in one WITH. */
  private def dkBpeCtesP(px: String, filter: String): String =
    s"""${px}w0 AS MATERIALIZED (
       |  SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w
       |        FROM documents WHERE text IS NOT NULL AND $filter)
       |  WHERE w <> ''
       |  GROUP BY 1
       |), ${px}s0 AS MATERIALIZED (
       |  SELECT word, cnt,
       |         list_append(list_transform(generate_series(1, CAST(length(word) AS BIGINT)),
       |           i -> substr(word, i, 1)), '</w>') AS seq
       |  FROM ${px}w0
       |), ${(1 to Rounds).map(dkBpeRoundP(px, _)).mkString(",\n")}""".stripMargin

  private lazy val dkBpeCtes: String = dkBpeCtesP("", "TRUE")

  private lazy val bpeMergesSql: String = {
    val rows = (1 to Rounds).map(i =>
      s"SELECT CAST($i AS BIGINT) AS merge_round, a AS sym_left, b AS sym_right, c AS pair_count FROM b$i")
      .mkString("\n  UNION ALL ")
    s"""WITH $dkBpeCtes
       |SELECT merge_round, sym_left, sym_right, pair_count FROM (
       |  $rows
       |)
       |ORDER BY merge_round ASC""".stripMargin
  }

  private lazy val bpeVocabSql: String =
    s"""WITH $dkBpeCtes
       |SELECT sym,
       |       CAST(count(DISTINCT word) AS BIGINT) AS n_words,
       |       CAST(count(*) AS BIGINT) AS n_slots,
       |       CAST(sum(cnt) AS BIGINT) AS weighted_count
       |FROM (SELECT word, cnt, unnest(seq) AS sym FROM s$Rounds)
       |GROUP BY 1
       |ORDER BY sym ASC""".stripMargin

  private lazy val bpeSubtokenStatsSql: String =
    s"""WITH $dkBpeCtes,
       |wmap AS (SELECT word, CAST(len(seq) AS BIGINT) AS n_sub FROM s$Rounds),
       |cw AS (
       |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
       |  FROM documents WHERE text IS NOT NULL
       |), j AS (
       |  SELECT c.doc_id, c.source, m.n_sub
       |  FROM cw c JOIN wmap m ON m.word = c.w
       |  WHERE c.w <> ''
       |)
       |SELECT source,
       |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |       CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(n_sub) AS BIGINT) AS n_subtokens
       |FROM j GROUP BY 1 ORDER BY source ASC""".stripMargin

  /** Tokenizer stability: BPE trained independently on the even and
    * odd doc_id halves, merge lists compared round by round — a
    * homogeneous corpus learns the same merges from either half; a
    * divergent round is where corpus heterogeneity starts rewriting
    * the tokenizer. Output per round: both pairs and a same_pair
    * flag. */
  def bpeStability(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val even = Bpe.train(
      Bpe.wordDict(docs.filter(pmod(col("doc_id"), lit(2)) === 0)), Rounds)._1
    val odd = Bpe.train(
      Bpe.wordDict(docs.filter(pmod(col("doc_id"), lit(2)) === 1)), Rounds)._1
    val e = spark.createDataset(even).select(col("round").as("merge_round"),
      col("left").as("left_even"), col("right").as("right_even"))
    val o = spark.createDataset(odd).select(col("round").as("mr2"),
      col("left").as("left_odd"), col("right").as("right_odd"))
    e.join(o, col("merge_round") === col("mr2"), "full_outer")
      .select(coalesce(col("merge_round"), col("mr2")).as("merge_round"),
        col("left_even"), col("right_even"), col("left_odd"), col("right_odd"),
        when(col("left_even").isNotNull && col("left_odd").isNotNull &&
          col("left_even") === col("left_odd") &&
          col("right_even") === col("right_odd"), lit(1L)).otherwise(lit(0L))
          .as("same_pair"))
      .orderBy(col("merge_round").asc)
  }

  private lazy val bpeStabilitySql: String = {
    def merges(px: String, l: String, r: String) = (1 to Rounds).map(i =>
      s"SELECT CAST($i AS BIGINT) AS merge_round, a AS $l, b AS $r FROM ${px}b$i")
      .mkString("\n  UNION ALL ")
    s"""WITH ${dkBpeCtesP("ev", "doc_id % 2 = 0")},
       |${dkBpeCtesP("od", "doc_id % 2 = 1")},
       |em AS (${merges("ev", "left_even", "right_even")}),
       |om AS (${merges("od", "left_odd", "right_odd")})
       |SELECT COALESCE(e.merge_round, o.merge_round) AS merge_round,
       |       e.left_even, e.right_even, o.left_odd, o.right_odd,
       |       CAST(CASE WHEN e.left_even IS NOT NULL AND o.left_odd IS NOT NULL
       |                  AND e.left_even = o.left_odd AND e.right_even = o.right_odd
       |            THEN 1 ELSE 0 END AS BIGINT) AS same_pair
       |FROM em e FULL JOIN om o ON e.merge_round = o.merge_round
       |ORDER BY merge_round ASC""".stripMargin
  }

  // ---- catalog wiring -----------------------------------------------

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bpe_merges" -> (bpeMerges _),
    "bpe_vocab" -> (bpeVocab _),
    "bpe_subtoken_stats" -> (bpeSubtokenStats _),
    "bpe_stability" -> (bpeStability _)
  )

  val oracles: Map[String, String] = Map(
    "bpe_merges" -> bpeMergesSql,
    "bpe_vocab" -> bpeVocabSql,
    "bpe_subtoken_stats" -> bpeSubtokenStatsSql,
    "bpe_stability" -> bpeStabilitySql
  )
}
