package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RedactionSpec extends SparkSpec {
  import spark.implicits._

  test("emails and phone-like runs are counted and replaced") {
    val df = Seq(
      (1L, "contact bob.smith+spam@corp.example.co or call +1 (555) 123-4567 now"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.io c@d.org and digits 555 867 5309")
    ).toDF("doc_id", "text")
    val out = Redaction.scrubReport(df)
      .select($"doc_id", $"n_emails", $"n_phones")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 1L, 1L), (2L, 0L, 0L), (3L, 2L, 1L)))
    val red = df.orderBy($"doc_id").select(Redaction.redact($"text"))
      .as[String].collect().toSeq
    assert(red(0) == "contact <EMAIL> or call <PHONE> now")
    assert(red(1) == "no pii here at all")
    assert(red(2) == "two mails <EMAIL> <EMAIL> and digits <PHONE>")
  }

  test("redaction order: the email rule consumes its digits before the phone rule runs") {
    // digits inside an email local part must not yield a phantom <PHONE>
    val df = Seq("reach 555123456789@phishy.example.com today").toDF("text")
    assert(df.select(Redaction.redact($"text")).as[String].head() ==
      "reach <EMAIL> today")
  }

  test("short digit runs below the 7-char phone floor are left alone") {
    val df = Seq("version 1.2 of 2024 build 12345").toDF("text")
    val (ne, np) = df.select(
      Redaction.matchCount($"text", Redaction.emailPattern),
      Redaction.matchCount($"text", Redaction.phonePattern)).as[(Long, Long)].head()
    assert(ne == 0L && np == 0L)
    assert(df.select(Redaction.redact($"text")).as[String].head() ==
      "version 1.2 of 2024 build 12345")
  }
}
