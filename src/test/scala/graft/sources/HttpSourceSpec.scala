package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{StringType, StructField, StructType}

class HttpSourceSpec extends SparkSpec {
  import HttpSource._

  private val cfg = FetchConfig(pageSize = 25, maxPages = 20, targetRows = 100)

  test("withRetry: succeeds after transient failures, exhausts after maxRetries") {
    var calls = 0
    val slept = scala.collection.mutable.ArrayBuffer[Double]()
    val out = withRetry(cfg, slept += _) { calls += 1; if (calls < 3) sys.error("boom"); 42 }
    assert(out == 42 && calls == 3)
    // reference backoff from exponent 0: 1.5·2^0, 1.5·2^1
    assert(slept.toSeq == Seq(1.5, 3.0))
    assertThrows[RuntimeException] {
      withRetry(cfg, _ => ())({ sys.error("always") }: Int)
    }
  }

  test("collectPaginated: dedupes across pages, truncates to target") {
    // every page returns the same leading symbol plus fresh ones
    val out = collectPaginated(cfg, (r: String) => r, _ => ()) { (start, count) =>
      "DUP" +: (start until start + count - 1).map(i => s"S$i")
    }
    assert(out.size == 100)
    assert(out.distinct.size == 100)
    assert(out.head == "DUP")
  }

  test("collectPaginated: all-duplicate pages do NOT count toward the empty-page stop") {
    // pages 2-4 repeat page 1 (overlapping pagination); page 5 has fresh rows
    val out = collectPaginated(cfg.copy(targetRows = 4), (r: String) => r, _ => ()) { (start, _) =>
      if (start < 100) Seq("A", "B") else Seq("C", "D")
    }
    assert(out == Seq("A", "B", "C", "D"))
  }

  test("collectPaginated: stops after consecutive empty pages") {
    var pages = 0
    val out = collectPaginated(cfg, (r: String) => r, _ => ()) { (start, _) =>
      pages += 1
      if (start >= 25) Seq.empty else Seq("A", "B")
    }
    assert(out == Seq("A", "B"))
    assert(pages == 3) // 1 productive + 2 consecutive empties
  }

  test("validate: enforces row count and coverage floor like the reference scraper") {
    val good = Seq.fill(100)(Map[String, Any]("price" -> 1.0))
    validate(good, cfg, Map("price" -> 0.9)) // no throw
    assertThrows[ValidationError] {
      validate(good.take(99), cfg, Map.empty)
    }
    val sparse = Seq.fill(89)(Map[String, Any]("price" -> 1.0)) ++
      Seq.fill(11)(Map[String, Any]("price" -> null))
    assertThrows[ValidationError] {
      validate(sparse, cfg, Map("price" -> 0.9))
    }
  }

  test("toDataFrame lands a batch with the declared bronze schema") {
    val schema = StructType(Seq(StructField("symbol", StringType), StructField("name", StringType)))
    val df = toDataFrame(spark, Seq(Row("AAA", "Alpha"), Row("BBB", null)), schema)
    assert(df.schema == schema && df.count() == 2)
  }
}
