package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Byte-pair-encoding merge training over the word-frequency
  * dictionary — the classic subword-tokenizer construction (Sennrich,
  * Haddow & Birch 2016, "Neural Machine Translation of Rare Words
  * with Subword Units"): start from characters plus an end-of-word
  * marker, repeatedly count adjacent symbol pairs weighted by word
  * frequency, and merge the most frequent pair corpus-wide. The
  * trained artifact (ordered merge list + final symbol vocabulary) IS
  * the tokenizer; a 100 TB pipeline trains it once and applies it to
  * every document (reference analog: the token-count columns its
  * staging models derive — graft generalizes the surface to training
  * the tokenizer itself).
  *
  * Determinism: pure integer arithmetic end-to-end (pair counts are
  * exact int64 sums; the argmax tiebreak is count DESC, then
  * lexicographic (left, right) — binary string order, identical on
  * both engines), so a DuckDB oracle replays every round exactly.
  *
  * Scale shape: training runs on the DISTINCT-WORD dictionary, not
  * the corpus — the one corpus-scale pass is the word-count groupBy
  * (map-side combinable). The dict is then orders of magnitude
  * smaller (Heaps' law), and each merge round touches only dict-sized
  * frames. Adaptive execution (the [[Components]] ethos): a limit
  * probe reads the dict size; at or under `driverWordLimit` words the
  * loop runs on the driver over the collected dict (a bounded fetch,
  * like a broadcast build side), above it the relational round
  * ([[mergeRound]]) runs distributed — windows partitioned by word,
  * per-round `localCheckpoint` truncating the lineage exactly like
  * the k-means trainer. Both paths produce identical merges
  * (greedy left-to-right == run-parity; see [[mergeRound]]).
  */
object Bpe {

  /** End-of-word marker symbol (never a corpus character: words are
    * whitespace-split tokens, so they contain no '<'-delimited tag). */
  val EndOfWord = "</w>"

  /** Dict sizes at or under this train on the driver. */
  val DriverWordLimit = 65536L

  final case class Merge(round: Long, left: String, right: String, pairCount: Long)

  /** (word, cnt) — corpus word-frequency dictionary: whitespace-split
    * tokens, empty tokens dropped, cnt = total occurrences. The ONE
    * corpus-scale aggregation of training. */
  def wordDict(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word").isNotNull && col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** (word, cnt, seq): seq = characters of `word` followed by
    * [[EndOfWord]] — the round-0 symbol sequences. */
  def initSeqs(dict: DataFrame): DataFrame =
    dict.select(col("word"), col("cnt").cast("long").as("cnt"),
      concat(
        transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1))),
        array(lit(EndOfWord))).as("seq"))

  /** Train `rounds` merges. Returns (ordered merges, final sequences
    * frame (word, cnt, seq)). Stops early when no adjacent pair is
    * left to merge. `driverWordLimit = 0` forces the distributed loop
    * (used by specs to pin path equivalence). */
  def train(dict: DataFrame, rounds: Int,
      driverWordLimit: Long = DriverWordLimit): (Seq[Merge], DataFrame) = {
    require(rounds >= 1 && rounds <= 256, "rounds must be in [1, 256]")
    val spark = dict.sparkSession
    val d = dict.select(col("word").cast("string").as("word"),
      col("cnt").cast("long").as("cnt"))
    if (driverWordLimit > 0 &&
        d.limit((driverWordLimit + 1).toInt).count() <= driverWordLimit) {
      import spark.implicits._
      val local = d.as[(String, Long)].collect().toSeq.sortBy(_._1)
      val (merges, seqs) = trainLocal(local, rounds)
      (merges, spark.createDataset(seqs).toDF("word", "cnt", "seq"))
    } else trainDistributed(d, rounds)
  }

  /** Apply an ordered merge list to ONE word (chars + [[EndOfWord]],
    * then each merge greedily left-to-right in training order) — the
    * inference half of [[train]]: segmenting words the training dict
    * never saw. Matches the training-side sequences exactly on seen
    * words (spec-pinned). */
  def segment(word: String, merges: Seq[Merge]): Seq[String] =
    merges.foldLeft(charSyms(word) :+ EndOfWord) {
      (s, m) => mergeGreedy(s, m.left, m.right)
    }

  /** Final-vocabulary summary of trained sequences: per symbol, the
    * number of distinct words containing it, total sequence slots,
    * and the occurrence-weighted count. Bounded output: the symbol
    * inventory is at most |alphabet| + rounds. */
  def vocab(finalSeqs: DataFrame): DataFrame =
    finalSeqs.select(col("word"), col("cnt"), explode(col("seq")).as("sym"))
      .groupBy(col("sym"))
      .agg(countDistinct(col("word")).as("n_words"),
        count(lit(1)).as("n_slots"),
        sum(col("cnt")).cast("long").as("weighted_count"))
      .orderBy(col("sym").asc)

  // ---- driver path ---------------------------------------------------

  /** Greedy left-to-right application of one merge: scan the
    * sequence; whenever (s(i), s(i+1)) == (a, b), emit a+b and skip
    * both. Overlapping runs ("aaa" under (a,a)) resolve left-first —
    * the textbook rule. */
  private[graft] def mergeGreedy(s: IndexedSeq[String], a: String, b: String): IndexedSeq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += (a + b); i += 2 }
      else { out += s(i); i += 1 }
    }
    out.toIndexedSeq
  }

  /** One symbol per Unicode CODE POINT — what Spark's `substr`/
    * `length` (UTF8String counts code points) and DuckDB's `substr`
    * do. A UTF-16 `w.map(_.toString)` split would shear non-BMP
    * characters into lone surrogates, diverging from the distributed
    * init and producing un-encodable symbols. */
  private[graft] def charSyms(w: String): IndexedSeq[String] =
    w.codePoints().toArray
      .map(cp => new String(Character.toChars(cp))).toIndexedSeq

  /** Unsigned lexicographic comparison of the UTF-8 encodings — the
    * collation Spark StringType and DuckDB VARCHAR share. */
  private[graft] def utf8Compare(x: String, y: String): Int = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  private[graft] def trainLocal(dict: Seq[(String, Long)],
      rounds: Int): (Seq[Merge], Seq[(String, Long, Seq[String])]) = {
    var seqs: Seq[(String, Long, IndexedSeq[String])] =
      dict.map { case (w, c) => (w, c, charSyms(w) :+ EndOfWord) }
    val merges = mutable.ArrayBuffer.empty[Merge]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val counts = mutable.Map.empty[(String, String), Long]
      seqs.foreach { case (_, c, s) =>
        var i = 0
        while (i + 1 < s.length) {
          val k = (s(i), s(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // max count, ties broken by binary (left, right) order — the
        // exact ORDER BY c DESC, a ASC, b ASC the oracle writes.
        // "binary" means UTF-8 bytes compared unsigned (what Spark's
        // StringType and DuckDB VARCHAR both do); Scala's default
        // String ordering compares UTF-16 code units, which diverges
        // for supplementary-plane symbols vs U+E000–U+FFFF, so the
        // tiebreak goes through utf8Compare to keep the driver path
        // bit-identical to the distributed path and the oracle.
        val ((ba, bb), bc) = counts.min(new Ordering[((String, String), Long)] {
          def compare(x: ((String, String), Long), y: ((String, String), Long)): Int = {
            var c = java.lang.Long.compare(y._2, x._2)
            if (c == 0) c = utf8Compare(x._1._1, y._1._1)
            if (c == 0) c = utf8Compare(x._1._2, y._1._2)
            c
          }
        })
        merges += Merge(r.toLong, ba, bb, bc)
        seqs = seqs.map { case (w, c, s) => (w, c, mergeGreedy(s, ba, bb)) }
        r += 1
      }
    }
    (merges.toSeq, seqs.map { case (w, c, s) => (w, c, s: Seq[String]) })
  }

  // ---- distributed path ----------------------------------------------

  private def trainDistributed(dict: DataFrame, rounds: Int): (Seq[Merge], DataFrame) = {
    var seqs = initSeqs(dict).localCheckpoint(true)
    val merges = mutable.ArrayBuffer.empty[Merge]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val best = seqs.filter(size(col("seq")) >= 2)
        .select(col("cnt"),
          explode(sequence(lit(1), size(col("seq")) - 1)).as("j"), col("seq"))
        .groupBy(element_at(col("seq"), col("j")).as("a"),
          element_at(col("seq"), col("j") + 1).as("b"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (ba, bb, bc) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(r.toLong, ba, bb, bc)
        val next = mergeRound(seqs, ba, bb).localCheckpoint(true)
        seqs.unpersist(blocking = false)
        seqs = next
        r += 1
      }
    }
    (merges.toSeq, seqs)
  }

  /** One relational merge round: positions hit by the pair, greedy
    * overlap resolution by RUN PARITY, rebuild. Greedy left-to-right
    * and run-parity coincide: consecutive hit positions require
    * a == b (hit at j and j+1 forces seq(j+1) = b = a), and on a run
    * of same-symbol hits greedy takes every other one from the run
    * start — exactly the even-offset rule. A merged symbol can never
    * re-match within the round (a+b is strictly longer than a). The
    * oracle replays this same construction CTE for CTE. */
  private[graft] def mergeRound(seqs: DataFrame, a: String, b: String): DataFrame = {
    val hits = seqs.filter(size(col("seq")) >= 2)
      .select(col("word"), explode(sequence(lit(1), size(col("seq")) - 1)).as("j"), col("seq"))
      .filter(element_at(col("seq"), col("j")) === lit(a) &&
        element_at(col("seq"), col("j") + 1) === lit(b))
      .select(col("word"), col("j"))
    val wRun = Window.partitionBy(col("word")).orderBy(col("j").asc)
    val kept = hits.withColumn("grp", col("j") - row_number().over(wRun))
      .withColumn("j0", min(col("j")).over(Window.partitionBy(col("word"), col("grp"))))
      .filter((col("j") - col("j0")) % 2 === 0)
      .select(col("word").as("kw"), col("j").as("kj"))
    // words without a kept hit pass through untouched (anti-join):
    // per round most of the dict is unaffected, so only the hit words
    // pay the explode/regroup
    val hitWords = kept.select(col("kw")).distinct()
    val unchanged = seqs.join(hitWords, col("word") === col("kw"), "left_anti")
    val consumed = kept.select(col("kw").as("cw"), col("kj").as("cj"))
    val rebuilt = seqs.join(hitWords, col("word") === col("kw"), "left_semi")
      .select(col("word"), col("cnt"),
        explode(sequence(lit(1), size(col("seq")))).as("pos"), col("seq"))
      .join(kept, col("word") === col("kw") && col("pos") === col("kj"), "left")
      .join(consumed, col("word") === col("cw") && col("pos") - 1 === col("cj"), "left")
      .filter(col("cj").isNull)
      .select(col("word"), col("cnt"), col("pos"),
        when(col("kj").isNotNull,
          concat(element_at(col("seq"), col("pos")),
            element_at(col("seq"), col("pos") + 1)))
          .otherwise(element_at(col("seq"), col("pos"))).as("sym"))
      .groupBy(col("word"), col("cnt"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("sym")))),
        s => s.getField("sym")).as("seq"))
    unchanged.select(col("word"), col("cnt"), col("seq"))
      .unionByName(rebuilt)
  }
}
