package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: detect and redact sensitive
  * spans (emails, phone-like number runs) before any text leaves the
  * pipeline. Purely per-row regexp expressions — shuffle-free,
  * codegen'd, and the patterns are written in the regex subset that
  * Java (Spark) and RE2 (DuckDB/Go tooling) interpret identically:
  * character classes, bounded repetition, alternation — no lookaround,
  * no backreferences, no shorthand classes whose definitions differ
  * between engines (e.g. \s includes vertical tab in Java, not RE2).
  *
  * At 100 TB this runs inside the same scan that reads the corpus —
  * the scrub is a projection, so column pruning, pushdown, and
  * whole-stage codegen all still apply.
  */
object Redaction {

  /** Email spans — local part, @, dotted domain, 2+ letter TLD.
    * `[.]` not `\.`: identical regex semantics, but the bracket form
    * survives BOTH engines' SQL string parsers when the pattern is
    * embedded verbatim in shared-dialect oracle text (Spark's parser
    * drops the backslash from unknown escapes, turning `\.` into the
    * match-anything `.`). */
  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"

  /** Phone-like spans: 7+ characters of digits/space/parens/dash
    * starting and ending in a digit, optional leading + (`[+]` for
    * the same parser-survival reason as `[.]` above). Deliberately
    * permissive — curation prefers over-redaction of number runs to
    * leaking a real number. */
  val phonePattern: String = "[+]?[0-9][0-9() -]{5,}[0-9]"

  /** (pattern, replacement token) pairs applied in order. Emails go
    * first: after `<EMAIL>` is substituted no digits remain for the
    * phone pattern to partially re-match. */
  val defaultRules: Seq[(String, String)] = Seq(
    emailPattern -> "<EMAIL>",
    phonePattern -> "<PHONE>")

  /** Number of matches of `pattern` in `text` (0 for no match). */
  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** `text` with every match of every rule replaced by its token,
    * rules applied left to right. */
  def redact(text: Column, rules: Seq[(String, String)] = defaultRules): Column =
    rules.foldLeft(text) { case (t, (p, token)) => regexp_replace(t, p, token) }

  /** Per-document scrub report: match counts per rule class and the
    * redacted text's md5 (the redacted corpus fingerprint — lets a
    * pipeline verify scrub output without retaining the raw text). */
  def scrubReport(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      matchCount(col(textCol), emailPattern).as("n_emails"),
      matchCount(col(textCol), phonePattern).as("n_phones"),
      md5(redact(col(textCol))).as("redacted_fp"))
}
