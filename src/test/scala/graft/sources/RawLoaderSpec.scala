package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}

class RawLoaderSpec extends SparkSpec {
  import spark.implicits._

  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("rawcsv").toString
    Files.writeString(Paths.get(dir, "batch1.csv"),
      "symbol,name,price\nAAA, Alpha Corp ,12.5\nBBB,,\nCCC,\"Quoted, Inc\",9.1\n")
    Files.writeString(Paths.get(dir, "batch2.csv"),
      "symbol,name,price\nDDD,Delta,1.0\n")
    dir
  }

  test("loadCsv: all-string bronze schema, trim, empty->NULL, quotes, metadata columns") {
    val df = RawLoader.loadCsv(spark, writeFixture(), Seq("symbol", "name", "price"))
    assert(df.schema.filter(f => !f.name.startsWith("_"))
      .forall(_.dataType.typeName == "string"))
    val rows = df.select($"symbol", $"name", $"price").as[(String, Option[String], Option[String])]
      .collect().toSet
    assert(rows.contains(("AAA", Some("Alpha Corp"), Some("12.5")))) // trimmed
    assert(rows.contains(("BBB", None, None)))                      // empty -> NULL
    assert(rows.contains(("CCC", Some("Quoted, Inc"), Some("9.1")))) // quoted comma
    // per-file row numbers restart per source file
    val rns = df.select($"_source_file", $"_source_row_number").as[(String, Int)]
      .collect().groupBy(_._1).map { case (_, v) => v.map(_._2).sorted.toSeq }
    assert(rns.toSet == Set(Seq(1, 2, 3), Seq(1)))
    // load metadata present
    assert(df.select($"_load_id").distinct().count() >= 1)
    assert(df.filter($"_ingested_at".isNull).count() == 0)
  }

  test("loadJson lands JSON-lines with the same bronze contract as CSV") {
    val dir = Files.createTempDirectory("rawjson").toString
    Files.writeString(Paths.get(dir, "batch.json"),
      """{"symbol":"AAA","name":"Alpha","price":"12.5"}
        |{"symbol":"BBB","name":null,"price":null}
        |""".stripMargin)
    val df = RawLoader.loadJson(spark, dir, Seq("symbol", "name", "price"))
    assert(df.schema.filter(f => !f.name.startsWith("_"))
      .forall(_.dataType.typeName == "string"))
    val rows = df.select($"symbol", $"name", $"price")
      .as[(String, Option[String], Option[String])].collect().toSet
    assert(rows == Set(("AAA", Some("Alpha"), Some("12.5")), ("BBB", None, None)))
    assert(df.select($"_source_row_number").as[Int].collect().sorted.toSeq == Seq(1, 2))
  }

  test("csv and json sinks round-trip") {
    val out = Files.createTempDirectory("sink").toString
    val df = Seq(("A", 1), ("B", 2)).toDF("k", "v")
    RawLoader.writeCsv(df, s"$out/csv", single = true)
    RawLoader.writeJson(df, s"$out/json")
    assert(spark.read.option("header", "true").csv(s"$out/csv").count() == 2)
    assert(spark.read.json(s"$out/json").count() == 2)
  }
}
