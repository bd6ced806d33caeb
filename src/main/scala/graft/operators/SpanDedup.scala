package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftFunctions

/** Cross-document exact-substring dedup: find the maximal token spans
  * that occur verbatim in ≥ `minDocs` distinct documents — the
  * positional complement of the set-based families in [[TextDedup]].
  * MinHash/Jaccard answer "are these DOCUMENTS near-dups?"; this
  * answers "WHICH PART of this document is copied?" — the operation
  * behind substring-level training-data dedup (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better", whose
  * ExactSubstr dedup removes 50-token repeated substrings rather than
  * whole documents) and boilerplate excision.
  *
  * Algorithm — relational, no suffix arrays:
  *  1. every length-`n` token window becomes one (doc_id, pos, gram
  *     hash) row ([[gramPositions]] — ordered positional hashes from
  *     the native kernel, `posexplode`d);
  *  2. gram hashes appearing in ≥ `minDocs` distinct docs are the
  *     duplicated windows (hash-aggregate on the gram key, partial-agg
  *     friendly; a LEFT SEMI join marks the positions);
  *  3. per doc, overlapping/adjacent duplicated windows [pos, pos+n)
  *     merge into maximal spans: a window marks positions starting a
  *     new span (pos > running max end over earlier windows), a
  *     running sum of those marks numbers the spans, and a group-by
  *     yields [span_start, span_end).
  *
  * Every shared substring of ≥ n tokens is covered by ≥ 1 duplicated
  * window, so reported spans cover exactly the tokens inside maximal
  * shared regions (windows shorter than n at region edges are not
  * flagged — the span boundary is tight at the gram granularity).
  *
  * Scale shape (100 TB): step 1 is map-side; step 2 shuffles gram
  * rows once on the hash key (integer pairs, partial-aggregated) and
  * probes with a semi-join — no collect_list per gram, so a
  * boilerplate gram shared by millions of docs cannot blow up one
  * reducer (its positions stay distributed with their docs); step 3
  * shuffles only the DUPLICATED positions, partitioned per doc, and
  * each doc's window is bounded by its own token count. Nothing is
  * quadratic and no state outlives a group.
  *
  * Portability: the gram hash is the char-fold/131-fold family every
  * oracle replays ([[graft.functions.TextHashes]]); at this corpus
  * size collisions of the 30-bit modulus are possible in principle
  * and IDENTICAL on both engines, so the gate stays exact. A real
  * 100 TB run would widen to a 128-bit gram hash (same plan shape).
  */
object SpanDedup {

  /** (doc_id, pos, g): the hash of the token window starting at `pos`
    * (1-based — DuckDB list indexing — so span_end = pos_last + n is
    * an exclusive 1-based token index). Docs shorter than `n` tokens
    * contribute no rows. */
  def gramPositions(docs: DataFrame, n: Int, fast: Boolean = false): DataFrame = {
    require(n >= 2, "gramPositions needs n >= 2")
    TextDedup.withTokenHashes(docs, fast)
      .withColumn("ga", GraftFunctions.gramHashes(col("token_hashes"), n))
      .select(col("doc_id"), posexplode(col("ga")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("g"))
  }

  /** Duplicated-gram-key broadcast budget: 2²² keys. Sizing is
    * against the EXECUTOR-side hash relation, not the 8-byte wire
    * size: a single-long-key broadcast semi join builds a sparse
    * LongToUnsafeRowMap (~56 B/key — 16 B UnsafeRow page + two long
    * slots at 0.5 load factor), so the budget ceiling costs ~235 MiB
    * per executor — the deliberate RAM-for-shuffle trade that halves
    * the operator's dominant gram shuffle (sf100: 120.5 → 80.6 s
    * warm). The DRIVER fetch is the raw keys (≤ 33.5 MiB primitive
    * longs — the bounded-parameter-fetch policy class: Bloom bitset
    * ≤ 2²⁷ bits, Components.DriverEdgeLimit 2²¹ edges). Duplicated
    * gram KEYS are bounded by true cross-doc duplication, not corpus
    * size, so real corpora land under this at any SF. */
  val DupKeysBroadcastMax: Long = 1L << 22

  /** Test seam for the over-budget (Bloom-prescreen) branch — the
    * production budget above, overridable so SpanDedupSpec can force
    * the branch on fixture-sized corpora and pin bit-identity.
    * Volatile: the spec mutates it around a forced-branch run, and a
    * racing suite thread must at worst see the OTHER branch (results
    * are bit-identical by construction), never a torn read. */
  @volatile private[graft] var dupKeysBudget: Long = DupKeysBroadcastMax

  /** Live dup-key caches, FIFO by corpus (canonicalized-plan key).
    * The three span entries (spans / profile / excise) over one
    * corpus all need the SAME duplicated-key frame; caching it once
    * and sharing is the difference between paying the dominant gram
    * shuffle once per corpus and once per entry (the r12 immediate-
    * unpersist "hygiene" fix tripled the build — adjudicated in the
    * r12 verdict as a ~2× trio regression at sf0.1). Deterministic
    * lifetime instead: at most [[MaxLiveDupCaches]] corpora stay
    * cached (each ≤ [[DupKeysBroadcastMax]] longs ≈ 34 MiB), and the
    * oldest is unpersisted when a new corpus arrives — an SF sweep
    * holds a bounded set, not one frame per entry ever built. */
  private val MaxLiveDupCaches = 3

  /** Per-corpus dup-key cache entry: the persisted thin key frame plus
    * the over-budget branch's derived artifacts, each built AT MOST
    * ONCE per corpus. r13 built the capped Bloom bitset inside every
    * `duplicatedPositions` call — three times per corpus across the
    * span trio, and the build (a count, an nHash-way position explode
    * + distinct over ~30M keys, a ≤16 MiB collect) is exactly the
    * fixed ~20 s the sf100 probe showed on the trio's LIGHTEST entry,
    * whose own plan gains little from the prescreen it was paying to
    * construct. Lazily shared here, the trio pays the build once and
    * the light entry keeps the prescreen essentially free. */
  private final class DupCache(val frame: DataFrame) {
    lazy val nKeys: Long = frame.count() // cheap: cached thin frame
    lazy val bloom: BloomFilterJoin.BloomBits = {
      val mBits = math.min(1L << 27, math.max(1L << 20, nKeys * 8)).toInt
      val nHash = math.max(1, math.min(7,
        math.round(mBits.toDouble / nKeys * math.log(2)).toInt))
      BloomFilterJoin.build(frame, col("g"), mBits, nHash)
    }
  }

  private val liveDupCaches =
    new scala.collection.mutable.ArrayDeque[(Int, String, DupCache)]()

  /** Freshness token for a file-backed corpus: the sorted input-file
    * list of the plan's scans. A canonicalized plan compares EQUAL
    * after the files at the same path are rewritten in-session (the
    * relation is keyed by path, not content), so the plan key alone
    * could serve a stale persisted dup-key frame for a regenerated
    * fixture; part-file names are write-unique (UUID-suffixed), so the
    * listing changes whenever the corpus does. In-memory corpora
    * return an empty list and are fully covered by the plan key (a
    * LocalRelation canonicalizes over its data). */
  private def corpusToken(df: DataFrame): String =
    df.inputFiles.sorted.mkString("\n")

  private def cachedDupKeys(dup: DataFrame): DupCache = synchronized {
    val plan = dup.queryExecution.analyzed.canonicalized
    val key = plan.semanticHash()
    val token = corpusToken(dup)
    // hash for lookup, sameResult for CONFIRMATION — semanticHash is
    // documented collision-possible, and serving another corpus's key
    // frame on a 32-bit collision would be silently wrong output
    liveDupCaches.find { case (h, t, c) =>
      h == key && t == token && c.frame.queryExecution.analyzed.canonicalized.sameResult(plan)
    }.map(_._3).getOrElse {
      val cached = new DupCache(Persisted.index(dup))
      liveDupCaches.append((key, token, cached))
      while (liveDupCaches.size > MaxLiveDupCaches)
        liveDupCaches.removeHead()._3.frame.unpersist(blocking = false)
      cached
    }
  }

  /** Start positions of duplicated windows: (doc_id, pos) for every
    * length-`n` window whose gram occurs in ≥ `minDocs` distinct
    * docs. The shared first half of [[duplicatedSpans]] and
    * [[excised]].
    *
    * Scale shape (the r10→r11 I/O fix): the groupBy(g) already
    * shuffles the full gram stream once (unavoidable — df needs it);
    * the SEMI JOIN back used to shuffle it a second time. The
    * duplicated KEY set is persisted (shared across the span trio via
    * [[cachedDupKeys]]) and counted (one bounded probe), and when it
    * fits [[DupKeysBroadcastMax]] it is broadcast so the gram
    * stream's second pass stays map-side — at sf100 that halves the
    * operator's dominant shuffle volume. Over-budget corpora fall
    * back to the shuffle semi join unchanged. */
  private def duplicatedPositions(docs: DataFrame, n: Int, minDocs: Int,
      fast: Boolean = false): DataFrame = {
    require(minDocs >= 2, "span dedup needs minDocs >= 2 (1 would flag every window)")
    val grams = gramPositions(docs, n, fast)
    // duplicated gram keys — thin (g) frame; countDistinct partial-
    // aggregates per partition before the one shuffle on g; cached
    // once per corpus so the probe, the join, and the sibling span
    // entries read ONE computation
    val cache = cachedDupKeys(
      grams.groupBy(col("g"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") >= minDocs)
        .select(col("g")))
    val dup = cache.frame
    // fits-probe and key fetch are ONE bounded job against the cache
    val keyRows = dup.limit((dupKeysBudget + 1).toInt).collect()
    if (keyRows.length <= dupKeysBudget) {
      val spark = docs.sparkSession
      import spark.implicits._
      val keys = broadcast(keyRows.map(_.getLong(0)).toSeq.toDF("g"))
      grams.join(keys, Seq("g"), "left_semi").select(col("doc_id"), col("pos"))
    } else {
      // OVER-BUDGET (r13, measured: the regenerated sf100 corpus has
      // 30.3M duplicated gram keys — 7× past the exact-broadcast
      // budget, so the old fallback re-shuffled the ENTIRE gram
      // stream into the semi join): broadcast a CAPPED Bloom bitset
      // of the dup keys instead ([[BloomFilterJoin]] — ≤ 2²⁷ bits
      // = 16 MiB, the bounded-parameter policy ceiling) and prescreen
      // the gram stream MAP-SIDE; the exact semi join that restores
      // no-false-positive truth then shuffles only the survivors
      // (true duplicates + the bitset's fp share of the stream),
      // never the full stream. Result is bit-identical to the plain
      // semi join — the bloom can only pass extra candidates, which
      // the join then rejects (SpanDedupSpec pins the branch). The
      // bitset itself is built ONCE per corpus and shared across the
      // span trio ([[DupCache.bloom]] — r14, after the sf100 probe
      // priced the per-entry rebuild at ~20 s on the trio's lightest
      // plan).
      grams.filter(cache.bloom.mightContain(col("g")))
        .join(dup, Seq("g"), "left_semi").select(col("doc_id"), col("pos"))
    }
  }

  /** Maximal duplicated spans: (doc_id, span_start, span_end,
    * span_len) for every maximal run of tokens covered by length-`n`
    * windows occurring in ≥ `minDocs` distinct documents.
    * `span_end` is exclusive; `span_len = span_end - span_start` is
    * the token count a substring-level cleaner would excise. */
  def duplicatedSpans(docs: DataFrame, n: Int = 8, minDocs: Int = 2,
      fast: Boolean = false): DataFrame = {
    val dupPos = duplicatedPositions(docs, n, minDocs, fast)
    // interval merge of [pos, pos+n): new span iff pos starts past the
    // running max end of every earlier duplicated window in the doc
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
    val prevEnd = max(col("pos") + lit(n))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val marked = dupPos.withColumn("is_new",
      when(prevEnd.isNull.or(col("pos") > prevEnd), lit(1L)).otherwise(lit(0L)))
    val numbered = marked.withColumn("span_id",
      sum(col("is_new")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
    numbered.groupBy(col("doc_id"), col("span_id"))
      .agg(min(col("pos")).as("span_start"), (max(col("pos")) + lit(n)).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("span_len"))
  }

  /** The surgery itself: every doc with its duplicated spans excised
    * token-wise — (doc_id, clean_text, n_tokens, kept_tokens). Docs
    * without spans pass through verbatim; a fully-duplicated doc
    * keeps `clean_text = ""` (kept_tokens = 0), which a downstream
    * keeper filter drops.
    *
    * Shape: covered token positions = the union of [pos, pos+n) over
    * flagged windows (explode of an n-element sequence — fan-out n on
    * the DUPLICATED subset only, then distinct), removed from the
    * posexploded token stream with a LEFT ANTI join on (doc_id, pos);
    * the survivors re-assemble per doc via a position-sorted
    * collect_list. Each step is one keyed shuffle — no per-token
    * lambda over per-doc span lists (that form re-evaluates the
    * tokenization per element once CollapseProject inlines it —
    * O(tokens²) per doc). */
  def excised(docs: DataFrame, n: Int = 8, minDocs: Int = 2,
      fast: Boolean = false): DataFrame = {
    val covered = duplicatedPositions(docs, n, minDocs, fast)
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("pos"))
      .distinct()
    val toks = TextDedup.tokenized(docs)
      .select(col("doc_id"), size(col("tokens")).cast("long").as("n_tokens"),
        posexplode(col("tokens")))
      .select(col("doc_id"), col("n_tokens"), (col("pos") + 1).as("pos"), col("col").as("tok"))
    val kept = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("kept_tokens"),
        concat_ws(" ", expr("transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok)"))
          .as("clean_text"))
    docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_tokens"), coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
  }

  /** Per-document duplication profile: how much of each affected doc
    * is inside a duplicated span — (doc_id, n_spans, dup_tokens,
    * n_tokens, kept_tokens). Docs with no duplicated span don't
    * appear (their profile is trivially all-kept). */
  def spanProfile(docs: DataFrame, n: Int = 8, minDocs: Int = 2,
      fast: Boolean = false): DataFrame = {
    val perDoc = duplicatedSpans(docs, n, minDocs, fast)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), sum(col("span_len")).as("dup_tokens"))
    val sizes = TextDedup.tokenized(docs)
      .select(col("doc_id"), size(col("tokens")).cast("long").as("n_tokens"))
    perDoc.join(sizes, Seq("doc_id"))
      .select(col("doc_id"), col("n_spans"), col("dup_tokens"), col("n_tokens"),
        (col("n_tokens") - col("dup_tokens")).as("kept_tokens"))
  }
}
