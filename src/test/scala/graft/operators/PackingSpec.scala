package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  // deterministic doc lengths; ids 0..49, lengths 1..50
  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, i.toLong + 1)).toDF("doc_id", "n")

  test("packPlan prefix sums are consistent within every shard") {
    val p = Packing.packPlan(docs(50), "doc_id", $"n", nShards = 4,
        seed = "s", seqLen = 16)
      .select($"shard", $"okey", $"n_tok", $"cum", $"start",
        $"seq_first", $"seq_last", $"offset")
      .as[(Int, String, Long, Long, Long, Long, Long, Long)].collect()
    p.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._2)) // okey order (distinct ids -> distinct keys)
      var prev = 0L
      ordered.foreach { case (_, _, n, cum, start, sf, sl, off) =>
        assert(start == prev, "start must equal the previous cum")
        assert(cum == start + n)
        assert(sf == start / 16 && sl == (cum - 1) / 16)
        assert(off == start % 16 && off >= 0 && off < 16)
        prev = cum
      }
    }
  }

  test("docs longer than seqLen always split; a doc aligned inside one chunk never does") {
    val d = Seq((1L, 40L), (2L, 3L), (3L, 100L)).toDF("doc_id", "n")
    val p = Packing.packPlan(d, "doc_id", $"n", nShards = 1, seed = "s", seqLen = 16)
      .select($"doc_id", $"seq_first", $"seq_last").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // 40 and 100 both exceed 16 tokens -> must straddle
    assert(p(1L)._1 != p(1L)._2)
    assert(p(3L)._1 != p(3L)._2)
  }

  test("packSummary: totals, ceil sequence count, split accounting") {
    val s = Packing.packSummary(docs(50), "doc_id", $"n", nShards = 4,
        seed = "s", seqLen = 16)
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(s.map(_._2).sum == 50)
    assert(s.map(_._3).sum == (1L to 50L).sum)
    s.foreach { case (_, _, tokens, nSeqs, splits) =>
      assert(nSeqs == (tokens + 15) / 16, "n_seqs must be ceil(tokens/seqLen)")
      assert(splits >= 0 && splits <= 50)
    }
  }

  test("packing is deterministic and reshuffles under a new seed") {
    val a = Packing.packPlan(docs(30), "doc_id", $"n", 2, "epoch0", 8)
      .select($"doc_id", $"shard", $"start").as[(Long, Int, Long)].collect().toSet
    val b = Packing.packPlan(docs(30), "doc_id", $"n", 2, "epoch0", 8)
      .select($"doc_id", $"shard", $"start").as[(Long, Int, Long)].collect().toSet
    assert(a == b)
    val c = Packing.packPlan(docs(30), "doc_id", $"n", 2, "epoch1", 8)
      .select($"doc_id", $"shard", $"start").as[(Long, Int, Long)].collect().toSet
    assert(a != c)
  }

  test("packPlan rejects non-positive seqLen") {
    intercept[IllegalArgumentException](
      Packing.packPlan(docs(1), "doc_id", $"n", 1, "s", 0))
  }
}
