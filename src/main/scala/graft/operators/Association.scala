package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Association measures between columns — the feature-screening
  * primitives (correlation for numeric pairs, mutual information for
  * categorical pairs) a curation pipeline runs before trusting a
  * signal. Both are built for exact oracle replay and bounded state,
  * like every statistic in this engine:
  *
  *  - [[pearson]] does NOT use Spark's `corr` (its running-moment
  *    merge is partition-order dependent — the same FP flap class as
  *    `avg` on doubles). Instead values quantize to integers at a
  *    fixed scale, the five sufficient statistics (Σx, Σy, Σxy, Σx²,
  *    Σy²) accumulate as EXACT decimal sums (order-independent,
  *    map-side combinable, O(1) state), and the closed form runs once
  *    on one row of exact integers — every engine computes the
  *    identical double.
  *  - [[mutualInformation]] needs a log; libm `ln`/`log2` are not
  *    bit-portable, so it uses the same octave-ladder log2 as
  *    [[LanguageModel.surprisalBits]] and [[Drift]]. Count ratios are
  *    formed as one double expression of exact integer counts, the
  *    branch for ratios above/below 1 is the same comparison on both
  *    engines, and per-cell contributions quantize to integer
  *    micro-bits before the order-independent sum.
  *
  * Scale shape: pearson is one aggregate pass (no shuffle beyond the
  * final 1-row reduce); MI shuffles once on the joint key, and
  * everything after runs on the joint-cardinality frame (cells ≪
  * rows for real categoricals) with broadcast marginals.
  */
object Association {

  /** Pearson correlation of two numeric columns as a 1-row frame
    * (n, corr_micro): corr quantized to 1e-6 (micro) units. Values
    * quantize to `scale` decimal places first — exactness of the
    * sufficient statistics is with respect to the quantized values.
    * NULL in either column drops the row. Degenerate inputs (n = 0,
    * or zero variance on either side) yield NULL corr_micro. */
  def pearson(df: DataFrame, x: Column, y: Column, scale: Int = 2): DataFrame = {
    require(scale >= 0 && scale <= 6, "scale must be in [0, 6]")
    val q = math.pow(10, scale)
    val xi = floor(x.cast("double") * lit(q) + lit(0.5)).cast("long")
    val yi = floor(y.cast("double") * lit(q) + lit(0.5)).cast("long")
    val vals = df.filter(x.isNotNull && y.isNotNull)
      .select(xi.as("xi"), yi.as("yi"))
    val sums = vals.agg(
      count(lit(1)).as("n"),
      sum(col("xi").cast("decimal(38,0)")).as("sx"),
      sum(col("yi").cast("decimal(38,0)")).as("sy"),
      sum((col("xi") * col("yi")).cast("decimal(38,0)")).as("sxy"),
      sum((col("xi") * col("xi")).cast("decimal(38,0)")).as("sxx"),
      sum((col("yi") * col("yi")).cast("decimal(38,0)")).as("syy"))
    def d(c: String): Column = col(c).cast("double")
    val cov = d("n") * d("sxy") - d("sx") * d("sy")
    val vx = d("n") * d("sxx") - d("sx") * d("sx")
    val vy = d("n") * d("syy") - d("sy") * d("sy")
    sums.select(col("n"),
      when(col("n") > 0 && col("sxx").isNotNull, // empty input → NULL sums
        when(vx > 0 && vy > 0,
          floor(cov / sqrt(vx * vy) * lit(1e6) + lit(0.5)).cast("long"))
          .otherwise(lit(null).cast("long")))
        .otherwise(lit(null).cast("long")).as("corr_micro"))
  }

  /** Welch's two-sample t statistic between the `sideA` rows and the
    * rest of `value`, from the same exact-decimal sufficient
    * statistics as [[pearson]] — one aggregate pass, O(1) state,
    * engine-identical doubles. Output (1 row): n_a, n_b, and in
    * micro units: mean_a, mean_b, t (Welch denominator √(s²ₐ/nₐ +
    * s²ᵦ/nᵦ), sample variances with the n−1 correction), plus the
    * Welch–Satterthwaite degrees of freedom. NULL t when either side
    * has < 2 rows or both variances are zero. */
  def welchT(df: DataFrame, value: Column, sideA: Column, scale: Int = 2): DataFrame = {
    require(scale >= 0 && scale <= 6, "scale must be in [0, 6]")
    val q = math.pow(10, scale)
    val xi = floor(value.cast("double") * lit(q) + lit(0.5)).cast("long")
    val vals = df.filter(value.isNotNull && sideA.isNotNull)
      .select(xi.as("xi"), sideA.cast("boolean").as("is_a"))
    def side(a: Boolean, suffix: String) = Seq(
      coalesce(sum(when(col("is_a") === lit(a), 1L).otherwise(0L)), lit(0L)).as(s"n$suffix"),
      coalesce(sum(when(col("is_a") === lit(a), col("xi")).otherwise(0L).cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as(s"s$suffix"),
      coalesce(sum(when(col("is_a") === lit(a), col("xi") * col("xi")).otherwise(0L)
        .cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")).as(s"ss$suffix"))
    val cols = side(true, "a") ++ side(false, "b")
    val sums = vals.agg(cols.head, cols.tail: _*)
    def d(c: String): Column = col(c).cast("double")
    // sample variance via the exact-sums form: (n·Σx² − (Σx)²) / (n·(n−1))
    val va = (d("na") * d("ssa") - d("sa") * d("sa")) / (d("na") * (d("na") - lit(1.0)))
    val vb = (d("nb") * d("ssb") - d("sb") * d("sb")) / (d("nb") * (d("nb") - lit(1.0)))
    val ma = d("sa") / d("na") / lit(q)
    val mb = d("sb") / d("nb") / lit(q)
    val sea = va / lit(q * q) / d("na") // variance of the mean, unquantized units
    val seb = vb / lit(q * q) / d("nb")
    val t = (ma - mb) / sqrt(sea + seb)
    val dof = (sea + seb) * (sea + seb) /
      (sea * sea / (d("na") - lit(1.0)) + seb * seb / (d("nb") - lit(1.0)))
    def micro(c: Column): Column = floor(c * lit(1e6) + lit(0.5)).cast("long")
    sums.select(col("na").as("n_a"), col("nb").as("n_b"),
      when(col("na") >= 2 && col("nb") >= 2, micro(ma)).otherwise(lit(null).cast("long"))
        .as("mean_a_micro"),
      when(col("na") >= 2 && col("nb") >= 2, micro(mb)).otherwise(lit(null).cast("long"))
        .as("mean_b_micro"),
      when(col("na") >= 2 && col("nb") >= 2 && (va > 0 || vb > 0), micro(t))
        .otherwise(lit(null).cast("long")).as("t_micro"),
      when(col("na") >= 2 && col("nb") >= 2 && (va > 0 || vb > 0), micro(dof))
        .otherwise(lit(null).cast("long")).as("dof_micro"))
  }

  /** Pointwise-MI decomposition of two categorical columns: one row
    * per observed (a, b) cell with its count and its contribution
    * (c_ab/N)·log2(c_ab·N / (c_a·c_b)) in integer micro-bits. The
    * total MI is the sum of `mi_microbits` (≥ 0 up to the ladder's
    * ≤0.09-bit interpolation bias per term; per-cell terms are
    * legitimately signed). NULL in either column drops the row. */
  def mutualInformation(df: DataFrame, a: Column, b: Column): DataFrame = {
    val joint = df.filter(a.isNotNull && b.isNotNull)
      .groupBy(a.as("a"), b.as("b")).agg(count(lit(1)).as("c_ab"))
    val ca = joint.groupBy(col("a")).agg(sum(col("c_ab")).as("c_a"))
    val cb = joint.groupBy(col("b")).agg(sum(col("c_ab")).as("c_b"))
    val n = joint.agg(sum(col("c_ab")).as("n"))
    // ratio below/above 1 decided on the same double both engines
    // build: rInv = (c_a·c_b)/(c_ab·N) = 1/r, so log2 r = +surprisal
    // when rInv ≤ 1 and −surprisal(1/rInv) otherwise
    val rInv = (col("c_a").cast("double") * col("c_b").cast("double")) /
      (col("c_ab").cast("double") * col("n").cast("double"))
    val log2r = when(rInv <= lit(1.0), LanguageModel.surprisalBits(rInv))
      .otherwise(-LanguageModel.surprisalBits(lit(1.0) / rInv))
    joint.join(broadcast(ca), Seq("a"))
      .join(broadcast(cb), Seq("b"))
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("c_ab"),
        floor(col("c_ab").cast("double") / col("n").cast("double") * log2r
          * lit(1e6) + lit(0.5)).cast("long").as("mi_microbits"))
  }
}
