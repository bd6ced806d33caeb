package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.GraftFunctions

/** Embedding similarity search over `array<float>` columns
  * (SURVEY.md §7.4 north-star extension; harness `embeddings` table).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact top-k per query — broadcast the query
  *    set, stream the corpus once, per-partition heap via
  *    row_number-over-window on (query, score). The baseline.
  *  - [[lshTopK]]: random-hyperplane LSH — bucket every vector by the
  *    sign pattern of its dot products with a small set of anchor
  *    vectors, then search only within the query's bucket. Sub-linear
  *    per query at scale: the corpus scan is replaced by a bucket
  *    (equi-join) probe. Anchors here are the first `nPlanes` corpus
  *    vectors (deterministic and oracle-reproducible); production
  *    would draw Gaussian planes from a fixed seed.
  *
  * Dot products run on doubles with an explicit left-fold
  * (`aggregate(zip_with(...))`) so the oracle can replay the exact
  * FP operation order — cosine of unit vectors = dot product, and the
  * harness embeddings are unit-normalized (verified: max ‖v‖ drift
  * < 1e-6). Norms are still computed — the operators don't assume it.
  */
object Similarity {

  /** Explicit-order dot product of two float-array columns, in double —
    * the portable HOF form (no session registration needed). The
    * operators below use [[graft.GraftFunctions.dot]] instead: the
    * same left-to-right accumulation as a codegen'd Catalyst
    * expression (bit-identical result, ~10× faster). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Cosine similarity with explicit FP order (dot / (√‖a‖ · √‖b‖)). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Cosine from a fresh dot and *pre-computed* norms. Same FP ops in
    * the same order as [[cosine]] (norm = sqrt(dot(v,v)) evaluated
    * once per vector instead of once per pair) ⇒ bit-identical
    * output, ~3× fewer array traversals on the pair path. */
  private def cosinePre(a: Column, b: Column, normA: Column, normB: Column): Column =
    GraftFunctions.dot(a, b) / (normA * normB)

  private def norm(v: Column): Column =
    sqrt(GraftFunctions.dot(v, v))

  /** Exact top-k neighbors for each query vector. `queries` and
    * `corpus` both need (idCol, vecCol); self-matches are excluded.
    * The query side is broadcast — at 100 TB the corpus never
    * shuffles; each partition scores its slice and the final window
    * reduces k·|queries| rows, not the corpus. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      norm(col(vecCol)).as("q_norm"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      norm(col(vecCol)).as("c_norm"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", floor(
        cosinePre(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm")) * 1e6 + 0.5) / 1e6)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Random-projection dimensionality reduction (Johnson &
    * Lindenstrauss): replace each vector with its dot products onto
    * `planes.size` seeded Gaussian directions. Map-side only — one
    * codegen'd kernel call per direction against a literal plane
    * vector, no shuffle, no fitted state — and the projections are
    * cast to float so a projected corpus is a drop-in corpus for
    * every similarity operator here (brute force, LSH, IVF). The
    * 100 TB use: cut the per-pair cosine cost of a verify stage by
    * dim/rDim with a distance distortion bounded by the JL lemma.
    * Plane dimension must match the vector dimension — a mismatch
    * surfaces as NULL projections (graft_dot's length contract), not
    * a wrong number. */
  def randomProject(df: DataFrame, planes: Seq[Array[Float]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(planes.nonEmpty, "randomProject needs at least one plane")
    GraftFunctions.register(df.sparkSession)
    df.select(col(idCol), array(planes.map(p =>
      GraftFunctions.dot(col(vecCol), typedlit(p.toSeq)).cast("float")): _*).as(vecCol))
  }

  /** SplitMix64 step (Steele et al., public domain) — the statistical
    * mixer behind [[gaussianPlaneGrid]]'s counter-mode stream. */
  private def splitmix64(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic pseudo-Gaussian hyperplane matrix on an integer
    * grid: coordinate (p, d) is an Irwin–Hall sum of 12 uniform
    * 10-bit draws minus 6·1024 — approximately N(0, 1024²) — from a
    * counter-mode SplitMix64 stream, so the matrix is a pure function
    * of (seed, nPlanes, dim). The PRODUCTION plane family: unlike
    * first-n corpus anchors, bucket balance cannot degrade on corpora
    * with correlated leading ids.
    *
    * Integer grid on purpose: the plane value m/1024 (|m| ≤ 6144) is
    * EXACTLY representable in float and double, and its decimal
    * expansion is finite — so the DuckDB oracles replay the identical
    * plane matrix as integer literals divided by 1024, and every dot
    * product is bit-identical across engines. (Hyperplane LSH only
    * consumes the SIGN of dot(v, plane), so the Irwin–Hall tail
    * truncation vs a true Gaussian is irrelevant: direction uniformity
    * is what matters.) */
  def gaussianPlaneGrid(seed: Long, nPlanes: Int, dim: Int): Seq[Array[Int]] =
    Seq.tabulate(nPlanes) { p =>
      Array.tabulate(dim) { d =>
        val base = seed + (p.toLong * dim + d) * 12L
        var s = 0
        var j = 0
        while (j < 12) { s += (splitmix64(base + j) >>> 54).toInt; j += 1 }
        s - 6 * 1024
      }
    }

  /** [[gaussianPlaneGrid]] as the float planes the LSH kernels take
    * (m/1024 is exact in float — see the grid doc). */
  def gaussianPlanes(seed: Long, nPlanes: Int, dim: Int): Seq[Array[Float]] =
    gaussianPlaneGrid(seed, nPlanes, dim).map(_.map(_ / 1024.0f))

  /** Materialize the first `n` anchor vectors (by ascending id) as
    * driver-side values. This is a bounded PARAMETER fetch — O(n·dim)
    * bytes for a caller-chosen small n, the same class as broadcasting
    * ML centroids — not a data-size-dependent collect: the corpus
    * itself never reaches the driver. */
  private def collectPlanes(anchors: DataFrame, n: Int,
      idCol: String, vecCol: String): Seq[Array[Float]] =
    anchors.orderBy(col(idCol).asc).limit(n).select(col(vecCol))
      .collect().map(_.getSeq[Float](0).toArray).toSeq

  /** Sign-pattern bucket id from dot products with `nPlanes` anchor
    * vectors: bit i set iff dot(v, anchor_i) > 0, where i is the
    * anchor's RANK in id order (0..nPlanes-1) — never the raw id,
    * which would overflow the long bit position for ids ≥ 63.
    *
    * The planes ride in the plan as ONE literal matrix consumed by the
    * native `graft_hyperplane_keys` kernel, so bucketing is a pure
    * map-side projection: no join, no shuffle — at 100 TB the corpus
    * is bucketed in the same scan that reads it. */
  def withBucket(df: DataFrame, anchors: DataFrame, nPlanes: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(nPlanes > 0 && nPlanes <= 63, "withBucket supports 1..63 planes per bucket key")
    val planes = collectPlanes(anchors, nPlanes, idCol, vecCol)
    withBucketPlanes(df, planes, idCol, vecCol)
  }

  /** [[withBucket]] with already-materialized planes — callers that
    * bucket several frames against the SAME anchors (e.g. corpus and
    * queries in [[lshTopK]]) collect the planes once and share them. */
  def withBucketPlanes(df: DataFrame, planes: Seq[Array[Float]],
      idCol: String, vecCol: String): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    require(planes.nonEmpty, "withBucket needs at least one anchor vector")
    df.select(col(idCol), col(vecCol),
      GraftFunctions.hyperplaneKeys(col(vecCol), planes, planes.size)
        .getItem(0).as("bucket"))
  }

  /** Shared probe tail for every bucketed ANN path ([[lshTopK]],
    * [[ivfTopK]], [[ivfTopKTrained]]): equi-join the bucketed corpus
    * against the broadcast bucketed queries, score candidates with the
    * precomputed-norm cosine on the 1e-6 grid, rank per query
    * (ties → lowest neighbor id), keep k. One definition so the
    * rounding grid and tie-break order cannot drift between paths. */
  private def probeAndRank(cB: DataFrame, qB: DataFrame, keyCol: String, k: Int): DataFrame = {
    val scored = cB.join(broadcast(qB), keyCol)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", floor(
        cosinePre(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm")) * 1e6 + 0.5) / 1e6)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** LSH-bucketed approximate top-k: score only corpus vectors in the
    * query's bucket. Equi-join on bucket ⇒ shuffle-partitionable; no
    * all-pairs scan. Recall depends on nPlanes (fewer planes = bigger
    * buckets = higher recall, more compute). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, nPlanes: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding",
      planesOpt: Option[Seq[Array[Float]]] = None): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    require(nPlanes > 0 && nPlanes <= 63, "lshTopK supports 1..63 planes")
    // explicit planes (e.g. [[gaussianPlanes]] — the production family)
    // or the first-n corpus anchors; one materialization, both sides
    val planes = planesOpt.getOrElse(collectPlanes(corpus, nPlanes, idCol, vecCol))
    require(planes.size == nPlanes, s"lshTopK got ${planes.size} planes for nPlanes=$nPlanes")
    val cB = withBucketPlanes(corpus, planes, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"), col("bucket"),
        norm(col(vecCol)).as("c_norm"))
    val qB = withBucketPlanes(queries, planes, idCol, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"), col("bucket"),
        norm(col(vecCol)).as("q_norm"))
    probeAndRank(cB, qB, "bucket", k)
  }

  /** Multi-probe LSH top-k (cf. Lv et al., "Multi-probe LSH",
    * VLDB 2007): each query probes its own bucket PLUS every bucket at
    * Hamming distance 1 in sign-pattern space (one plane bit flipped).
    * A near neighbor that lands across a single hyperplane from the
    * query — the dominant recall failure of single-probe hyperplane
    * LSH — is recovered without adding planes, bands, or a second
    * index. Cost model: the query side explodes to `nPlanes + 1` thin
    * probe rows (queries ≪ corpus, so this is broadcast-side fan-out
    * only); the probe is still a pure bucket equi-join and the corpus
    * is still bucketed in the scan that reads it. A (query, neighbor)
    * pair can meet at most once — corpus vectors live in exactly one
    * bucket and the probe keys are distinct — so no dedup is needed. */
  def lshTopKMultiprobe(corpus: DataFrame, queries: DataFrame, k: Int, nPlanes: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding",
      planesOpt: Option[Seq[Array[Float]]] = None): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    require(nPlanes > 0 && nPlanes <= 63, "lshTopKMultiprobe supports 1..63 planes")
    val planes = planesOpt.getOrElse(collectPlanes(corpus, nPlanes, idCol, vecCol))
    require(planes.size == nPlanes,
      s"lshTopKMultiprobe got ${planes.size} planes for nPlanes=$nPlanes")
    val cB = withBucketPlanes(corpus, planes, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"), col("bucket"),
        norm(col(vecCol)).as("c_norm"))
    val probeKeys = (0 to nPlanes).map { i =>
      if (i == 0) col("bucket") else col("bucket").bitwiseXOR(lit(1L << (i - 1)))
    }
    val qB = withBucketPlanes(queries, planes, idCol, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        norm(col(vecCol)).as("q_norm"), explode(array(probeKeys: _*)).as("bucket"))
    probeAndRank(cB, qB, "bucket", k)
  }

  /** IVF cell assignment: each vector goes to its nearest (max
    * cosine) centroid; ties break by centroid id. Centroids are the
    * first `nCentroids` corpus vectors (deterministic and
    * oracle-reproducible; production would k-means from a fixed
    * seed). Pure map-side work against a broadcast centroid set. */
  def withIvfCell(df: DataFrame, centroids: DataFrame, nCentroids: Int, nProbe: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val c = centroids.orderBy(col(idCol).asc).limit(nCentroids)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("c_centroid"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("c_cos").desc, col("centroid_id").asc)
    df.crossJoin(broadcast(c))
      .withColumn("c_cos", cosinePre(col(vecCol), col("c_centroid"),
        norm(col(vecCol)), norm(col("c_centroid"))))
      .withColumn("c_rank", row_number().over(w))
      .filter(col("c_rank") <= nProbe)
      .select(col(idCol), col(vecCol), col("centroid_id").as("cell"))
  }

  /** IVF (inverted-file) approximate top-k: corpus vectors are
    * bucketed by nearest centroid; each query probes its `nProbe`
    * nearest cells and scores only their members. The scale path for
    * ANN when hyperplane buckets ([[lshTopK]]) are too coarse: cell
    * population tracks data density, and probing more cells trades
    * compute for recall without re-indexing. Equi-join on cell —
    * shuffle-partitionable, never an all-pairs scan. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val cCells = withIvfCell(corpus, corpus, nCentroids, nProbe = 1, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"), col("cell"),
        norm(col(vecCol)).as("c_norm"))
    val qCells = withIvfCell(queries, corpus, nCentroids, nProbe, idCol, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"), col("cell"),
        norm(col(vecCol)).as("q_norm"))
    // a query probing multiple cells can meet the same neighbor once
    // per cell only if assignments overlapped — they cannot (corpus
    // vectors live in exactly one cell), so no dedup is needed
    probeAndRank(cCells, qCells, "cell", k)
  }

  /** IVF top-k with TRAINED centroids ([[KMeans.fit]]) instead of the
    * first-n seed cells of [[ivfTopK]]: both sides assign map-side
    * against the literal centroid set (corpus → its single nearest
    * cell via [[KMeans.assignCells]]; queries → their `nProbe` nearest
    * cells via a sorted array-of-structs slice — still no join, no
    * window, no shuffle for cell assignment). The only shuffle-bearing
    * step is the bucket probe equi-join itself. Cell population tracks
    * data density because the centroids were trained on it — the
    * recall/compute knob IVF is chosen for. */
  def ivfTopKTrained(corpus: DataFrame, queries: DataFrame,
      centroids: Seq[(Int, Array[Double])], k: Int, nProbe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    require(centroids.nonEmpty && nProbe > 0, "ivfTopKTrained needs centroids and nProbe > 0")
    val cB = KMeans.assignCells(corpus, centroids, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
        col("cell"), norm(col(vecCol)).as("c_norm"))
    val v = col(vecCol)
    val scoredCells = array(centroids.map { case (cid, c) =>
      val cl = typedLit(c.toSeq)
      struct((GraftFunctions.dot(v, cl) / (norm(v) * sqrt(GraftFunctions.dot(cl, cl)))).as("cos"),
        lit(-cid).as("negcell"))
    }: _*)
    // sort desc on (cos, -cell): max cosine first, ties to the LOWEST
    // cell id — same total order as the assignment argmax
    val qB = queries.select(col(idCol).as("query_id"), v.as("q_vec"), norm(v).as("q_norm"),
        explode(slice(sort_array(scoredCells, asc = false), 1, nProbe)).as("sc"))
      .select(col("query_id"), col("q_vec"), col("q_norm"), (-col("sc.negcell")).as("cell"))
    probeAndRank(cB, qB, "cell", k)
  }

  /** Shared verification tail: join candidate (vec_a, vec_b) id pairs
    * back to their vectors and keep those with cosine ≥ threshold.
    * Norms are precomputed once per side (bit-identical to the
    * per-pair form — see [[cosinePre]]). */
  private def cosineVerify(corpus: DataFrame, cands: DataFrame, threshold: Double,
      idCol: String, vecCol: String): DataFrame = {
    val va = corpus.select(col(idCol).as("vec_a"), col(vecCol).as("va"),
      norm(col(vecCol)).as("na"))
    val vb = corpus.select(col(idCol).as("vec_b"), col(vecCol).as("vb"),
      norm(col(vecCol)).as("nb"))
    cands.join(va, "vec_a").join(vb, "vec_b")
      .withColumn("cos", floor(
        cosinePre(col("va"), col("vb"), col("na"), col("nb")) * 1e6 + 0.5) / 1e6)
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cos"))
  }

  /** Embedding near-duplicate pairs via multi-band hyperplane LSH —
    * the 100 TB path. Each vector gets `bands` independent signatures
    * (one per band of `planesPerBand` sign bits, planes = the first
    * bands·planesPerBand corpus vectors in id order, embedded as
    * literals); a pair becomes a CANDIDATE iff it collides in ≥ 1
    * band, then candidates are verified with the exact cosine tail.
    * The plan is map (signatures) → explode (one thin row per band) →
    * self equi-join on (band, key) → distinct → verify: every join is
    * an equi-join, nothing is ever all-pairs.
    *
    * Recall per pair at cosine c: 1-(1-p^r)^B with p = 1-acos(c)/π,
    * r = planesPerBand, B = bands. At real near-dup thresholds
    * (c ≥ 0.9 ⇒ p ≈ 0.86) the default 16×8 gives recall ≈ 0.995 with
    * 256-way bucket keys; permissive thresholds (c ≈ 0.4) need wide
    * cheap bands — many bands of few planes — because nearly-orthogonal
    * pairs barely co-bucket. Bucket population per band is corpus/2^r:
    * raise `planesPerBand` to keep the per-band self-join linear. */
  def nearDupPairs(corpus: DataFrame, threshold: Double,
      bands: Int = 16, planesPerBand: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding",
      planesOpt: Option[Seq[Array[Float]]] = None): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    require(planesPerBand > 0 && planesPerBand <= 63,
      "nearDupPairs supports 1..63 planes per band (band keys are single-long sign patterns)")
    require(bands > 0, "nearDupPairs needs at least one band")
    // explicit planes ([[gaussianPlanes]] — the production family) or
    // the first-n corpus anchors as the deterministic fallback
    val planes = planesOpt.getOrElse(collectPlanes(corpus, bands * planesPerBand, idCol, vecCol))
    require(planes.nonEmpty, "nearDupPairs needs a non-empty corpus")
    // band width is FIXED: fewer anchors than asked just means fewer
    // whole bands (the kernel ignores a trailing partial band, and the
    // oracle mirrors that); a corpus smaller than one band yields no
    // candidates — use nearDupPairsExact for corpora that tiny
    cosineVerify(corpus,
      bandedCandidates(corpus, planes, planesPerBand, idCol, vecCol),
      threshold, idCol, vecCol)
  }

  /** The banded candidate frame of [[nearDupPairs]]: distinct
    * (vec_a < vec_b) pairs colliding in ≥ 1 band. Exposed so tests
    * can MEASURE candidate volume — the quantity that decides whether
    * a near-dup parameterization survives scale (see
    * [[nearDupPairsIVF]] for the volume analysis). */
  def bandedCandidates(corpus: DataFrame, planes: Seq[Array[Float]],
      planesPerBand: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val sigs = corpus.select(col(idCol).as("vid"),
        posexplode(GraftFunctions.hyperplaneKeys(col(vecCol), planes, planesPerBand)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "key")
    sigs.as("x").join(sigs.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.vid") < col("y.vid"))
      .select(col("x.vid").as("vec_a"), col("y.vid").as("vec_b"))
      .distinct()
  }

  /** IVF candidate frame: each vector map-side-assigns to its
    * `nProbe` nearest trained centroids (same sorted array-of-structs
    * slice as [[ivfTopKTrained]] — no join, no window, no shuffle);
    * a pair is a candidate iff the two vectors share ≥ 1 probed cell.
    * Distinct (vec_a < vec_b) output. */
  def ivfCandidates(corpus: DataFrame, centroids: Seq[(Int, Array[Double])],
      nProbe: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    require(centroids.nonEmpty && nProbe > 0,
      "ivfCandidates needs centroids and nProbe > 0")
    // ONE literal centroid matrix via the fused kernel — bit-identical
    // to the per-centroid sort_array(struct(cos, -cell)) form (the
    // order the oracle replays) without k array-literal plan nodes
    val probed = corpus.select(col(idCol).as("vid"),
        explode(GraftFunctions.topCells(col(vecCol), centroids, nProbe)).as("cell"))
    probed.as("x").join(probed.as("y"),
        col("x.cell") === col("y.cell") && col("x.vid") < col("y.vid"))
      .select(col("x.vid").as("vec_a"), col("y.vid").as("vec_b"))
      .distinct()
  }

  /** Embedding near-duplicate pairs via a TRAINED IVF grid — the
    * permissive-threshold scale path. [[nearDupPairs]]' banded LSH is
    * the right tool at real near-dup thresholds (cos ≥ 0.9: narrow
    * bands, tiny buckets, ~zero noise collisions), but at permissive
    * thresholds the geometry turns against it: separating cos ≈ 0.4
    * pairs from random ones needs bands so cheap (few planes) that a
    * RANDOM pair collides somewhere with probability ≈
    * 1−(1−2^−r)^B — at the 32×4 compat parameterization that is
    * ≈ 0.87, i.e. the candidate set is ~all pairs and the verify
    * stage is O(n²) regardless of how clean the equi-join plan looks.
    * (Measured, not argued: see NearDupScaleSpec and SCALE.md.)
    *
    * This path instead clusters the corpus once ([[KMeans.fit]] — k
    * centroids, driver state k·dim, a parameter fetch) and generates
    * candidates only within shared probed cells. Candidate volume is
    * Σ_cells occupancy² ≈ nProbe²·N²/(2k): pick k ∝ N (e.g.
    * k = N/targetCellSize) and the volume is nProbe²·targetCellSize·N/2
    * — LINEAR in the corpus, and the per-cell self-join is an
    * equi-join that AQE splits on skewed cells. Recall is the IVF
    * trade: a pair is found iff the two vectors co-probe a cell;
    * near-identical vectors (the actual near-dup signal) rank the
    * same cell first with probability → 1, while moderate-cosine
    * pairs may split across cell boundaries — raise `nProbe` to
    * trade compute for recall without re-indexing. */
  def nearDupPairsIVF(corpus: DataFrame, threshold: Double,
      centroids: Seq[(Int, Array[Double])], nProbe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    cosineVerify(corpus,
      ivfCandidates(corpus, centroids, nProbe, idCol, vecCol),
      threshold, idCol, vecCol)

  /** Exact near-duplicate pairs: cosine ≥ threshold over ALL pairs
    * (vec_a < vec_b) — a broadcast nested loop, O(n²) in corpus size.
    * Only for small corpora and as the recall oracle in tests; the
    * scale path is [[nearDupPairs]]. */
  def nearDupPairsExact(corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val a = corpus.select(col(idCol).as("vec_a"), col(vecCol).as("va"),
      norm(col(vecCol)).as("na"))
    val b = corpus.select(col(idCol).as("vec_b"), col(vecCol).as("vb"),
      norm(col(vecCol)).as("nb"))
    a.join(broadcast(b), col("vec_a") < col("vec_b"))
      .withColumn("cos", floor(
        cosinePre(col("va"), col("vb"), col("na"), col("nb")) * 1e6 + 0.5) / 1e6)
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cos"))
  }
}
