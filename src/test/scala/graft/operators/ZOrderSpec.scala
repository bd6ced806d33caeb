package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave. */
  private def morton(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | ((a & (1L << i)) << i) | ((b & (1L << i)) << (i + 1))
    }

  test("zValue matches the reference interleave on exhaustive 5-bit space") {
    val rows = for (a <- 0L until 32L; b <- 0L until 32L) yield (a, b)
    val got = rows.toDF("a", "b")
      .select($"a", $"b", ZOrder.zValue($"a", $"b", 5).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z == morton(a, b, 5), s"($a,$b)") }
  }

  test("zValue is monotone-compatible: distinct points map to distinct z within range") {
    val rows = for (a <- 0L until 32L; b <- 0L until 32L) yield (a, b)
    val zs = rows.toDF("a", "b").select(ZOrder.zValue($"a", $"b", 5)).as[Long].collect()
    assert(zs.distinct.length == 1024)
    assert(zs.forall(z => z >= 0 && z < 1024))
  }

  test("bits outside each dimension's window are ignored (truncation aliasing)") {
    val out = Seq((256L, 0L), (0L, 0L)).toDF("a", "b")
      .select(ZOrder.zValue($"a", $"b", 8)).as[Long].collect()
    assert(out(0) == out(1))
  }

  test("zValue null propagation and bounds validation") {
    val r = Seq[(java.lang.Long, java.lang.Long)]((null, 1L)).toDF("a", "b")
      .select(ZOrder.zValue($"a", $"b", 4)).collect().head
    assert(r.isNullAt(0))
    intercept[IllegalArgumentException](ZOrder.zValue(lit(1), lit(1), 0))
    intercept[IllegalArgumentException](ZOrder.zValue(lit(1), lit(1), 32))
  }

  test("z-ordered files cover small rectangles in BOTH dims; a 1-d sort leaves dim b unbounded") {
    // 64x64 grid, one row per cell
    val grid = (for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b))
      .toDF("a", "b")
    def fileSpans(dir: String): Seq[(Long, Long)] = {
      new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-"))
        .map { f =>
          val d = spark.read.parquet(f.getPath)
            .agg(max($"a") - min($"a"), max($"b") - min($"b"))
            .as[(Long, Long)].collect().head
          d
        }.toSeq
    }
    val zDir = java.nio.file.Files.createTempDirectory("graft-z").toString
    ZOrder.writeZOrdered(grid, "a", "b", bits = 6, targetFiles = 16, outDir = zDir)
    val zSpans = fileSpans(zDir)
    assert(zSpans.size == 16)
    // file boundaries aren't tile-aligned (range sampling), so single
    // files straddling a quadrant boundary may span wide — but the
    // AVERAGE rectangle must stay far under the 63 full range in BOTH
    // dims (perfect alignment would give ~15)
    def avg(xs: Seq[Long]) = xs.sum.toDouble / xs.size
    assert(avg(zSpans.map(_._1)) < 32 && avg(zSpans.map(_._2)) < 32,
      s"z-order spans too wide: $zSpans")
    // baseline: sort by a only -> b spans the whole range in every file
    val aDir = java.nio.file.Files.createTempDirectory("graft-a").toString
    grid.repartitionByRange(16, $"a").sortWithinPartitions($"a")
      .write.mode("overwrite").parquet(aDir)
    val aSpans = fileSpans(aDir)
    assert(aSpans.forall { case (_, sb) => sb == 63 },
      "a-sorted baseline should leave b unbounded per file")
    assert(avg(zSpans.map(_._2)) < avg(aSpans.map(_._2)),
      "z-order must beat the 1-d sort on the second dimension")
    graft.sources.LocalFs.deleteRecursively(java.nio.file.Paths.get(zDir))
    graft.sources.LocalFs.deleteRecursively(java.nio.file.Paths.get(aDir))
  }

  test("read-side win: a 2-D predicate touches fewer z-ordered files than 1-d-sorted ones") {
    // 64x64 grid, 4 rows per cell — enough rows that file stats matter
    val grid = (for (a <- 0L until 64L; b <- 0L until 64L; r <- 0 until 4)
      yield (a, b, a * 64 + b + r)).toDF("a", "b", "v")
    val zDir = java.nio.file.Files.createTempDirectory("graft-zr").toString
    val aDir = java.nio.file.Files.createTempDirectory("graft-ar").toString
    ZOrder.writeZOrdered(grid, "a", "b", bits = 6, targetFiles = 16, outDir = zDir)
    grid.repartitionByRange(16, $"a").sortWithinPartitions($"a")
      .write.mode("overwrite").parquet(aDir)
    // the pruning a parquet reader gets from file/row-group min-max
    // stats: a file whose bounding rectangle misses the query window
    // is never opened. Count touched files per layout for a window.
    def touched(dir: String)(hit: (Long, Long, Long, Long) => Boolean): (Int, Int) = {
      val files = new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-"))
      val n = files.count { f =>
        val bounds = spark.read.parquet(f.getPath)
          .agg(min($"a"), max($"a"), min($"b"), max($"b"))
          .as[(Long, Long, Long, Long)].collect().head
        hit.tupled(bounds)
      }
      (n, files.length)
    }
    // the read-side WIN is the second dimension: filter on b alone.
    // The a-sorted layout has no b locality — every file spans all of
    // b and must be opened; z-ordered files cover small b-rectangles
    // and most are skipped on stats alone.
    def bWindow(aLo: Long, aHi: Long, bLo: Long, bHi: Long) = bHi >= 40 && bLo <= 47
    val (zHitB, zAll) = touched(zDir)(bWindow)
    val (aHitB, aAll) = touched(aDir)(bWindow)
    assert(aHitB == aAll, s"1-d layout should touch every file on a b-filter ($aHitB/$aAll)")
    assert(zHitB < aHitB, s"z-order touched $zHitB/$zAll vs 1-d $aHitB/$aAll")
    assert(zHitB.toDouble / zAll <= 0.5, s"z-order b-skip ratio too weak: $zHitB/$zAll")
    // on a 2-D window z-order still bounds BOTH dims: few files touched
    def abWindow(aLo: Long, aHi: Long, bLo: Long, bHi: Long) =
      aHi >= 16 && aLo <= 23 && bHi >= 40 && bLo <= 47
    val (zHit2, _) = touched(zDir)(abWindow)
    assert(zHit2.toDouble / zAll <= 0.25, s"z-order 2-D skip ratio too weak: $zHit2/$zAll")
    // correctness of the round-trip under the same predicate
    val zRows = spark.read.parquet(zDir)
      .filter($"a".between(16, 23) && $"b".between(40, 47)).count()
    assert(zRows == 8L * 8 * 4)
    // the predicate reaches the parquet scan (row-group pruning active)
    val plan = spark.read.parquet(zDir)
      .filter($"a".between(16, 23) && $"b".between(40, 47))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual(a,16"), plan)
    graft.sources.LocalFs.deleteRecursively(java.nio.file.Paths.get(zDir))
    graft.sources.LocalFs.deleteRecursively(java.nio.file.Paths.get(aDir))
  }
}
