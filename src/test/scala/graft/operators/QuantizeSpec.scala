package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("quantizeVectors: max-abs element hits ±127, values stay in range, scale is 127/maxabs") {
    val out = Quantize.quantizeVectors(
        Seq((1L, Seq(0.5f, -1.0f, 0.25f))).toDF("vec_id", "embedding"))
      .select($"q8", $"qscale").as[(Seq[Int], Double)].collect().head
    assert(out._1 == Seq(64, -127, 32), s"got ${out._1}")
    assert(out._2 == 127.0)
  }

  test("quantizeVectors: all-zero vector quantizes to zeros with qscale 0") {
    val out = Quantize.quantizeVectors(Seq((1L, Seq(0f, 0f))).toDF("vec_id", "embedding"))
      .select($"q8", $"qscale").as[(Seq[Int], Double)].collect().head
    assert(out._1 == Seq(0, 0) && out._2 == 0.0)
  }

  test("quantizeVectors: a null element nulls the whole struct (no silent mis-scale)") {
    val out = Seq((1L, Seq[java.lang.Float](1f, null))).toDF("vec_id", "embedding")
    val r = Quantize.quantizeVectors(out).select($"q8").collect().head
    assert(r.isNullAt(0))
  }

  test("quantized values never escape [-127, 127] on random vectors") {
    val rng = new scala.util.Random(7)
    val df = (1L to 300L).map(i => i -> Seq.fill(32)(rng.nextFloat() * 200 - 100))
      .toDF("vec_id", "embedding")
    val bad = Quantize.quantizeVectors(df)
      .select(explode($"q8").as("q")).filter($"q" > 127 || $"q" < -127).count()
    assert(bad == 0)
  }

  test("q8TopK ranking tracks exact cosine closely on separated clusters") {
    val rng = new scala.util.Random(11)
    def around(base: Array[Float], eps: Float) =
      base.map(v => v + (rng.nextFloat() * 2 - 1) * eps).toSeq
    val a = Array(1f, 0f, 0f, 0f); val b = Array(0f, 1f, 0f, 0f)
    val rows = (0L to 19L).map(i => i -> around(if (i % 2 == 0) a else b, 0.05f))
    val df = rows.toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(df, df.filter($"vec_id" < 2), k = 9)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val quant = Quantize.q8TopK(df, df.filter($"vec_id" < 2), k = 9)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // same-cluster neighbor SETS survive quantization (order may jitter)
    assert(quant == exact, s"quantized neighbor sets diverged: $quant vs $exact")
  }

  test("qcos is within quantization error of true cosine") {
    val rng = new scala.util.Random(13)
    val df = (0L to 29L).map(i => i -> Seq.fill(16)(rng.nextFloat() * 2 - 1))
      .toDF("vec_id", "embedding")
    val q = Quantize.q8TopK(df, df.filter($"vec_id" === 0L), k = 29)
      .select($"neighbor_id", $"qcos").as[(Long, Double)].collect().toMap
    val e = Similarity.bruteForceTopK(df, df.filter($"vec_id" === 0L), k = 29)
      .select($"neighbor_id", $"cos").as[(Long, Double)].collect().toMap
    assert(q.keySet == e.keySet)
    q.foreach { case (id, qc) =>
      assert(math.abs(qc - e(id)) < 0.02, s"vec $id: qcos $qc vs cos ${e(id)}")
    }
  }

  test("q8TopK excludes self and emits k ranks per query") {
    val rng = new scala.util.Random(17)
    val df = (0L to 9L).map(i => i -> Seq.fill(8)(rng.nextFloat())).toDF("vec_id", "embedding")
    val out = Quantize.q8TopK(df, df.filter($"vec_id" < 3), k = 4)
      .as[(Long, Int, Long, Double)].collect()
    assert(out.length == 12)
    assert(out.forall { case (q, _, n, _) => q != n })
    out.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == Seq(1, 2, 3, 4))
    }
  }
}
