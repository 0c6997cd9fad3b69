package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Regex-based PII detection and redaction — the scrub pass every
  * training-data pipeline runs before a corpus ships (emails, IP
  * addresses, phone numbers, long account-like digit runs).
  *
  * The patterns deliberately use only the regex subset shared by Java's
  * `Pattern` and RE2 (no lookaround, no backrefs), so the same pattern
  * string drives both the Spark operator and the SQL oracle, and both
  * engines agree match-for-match under leftmost-nonoverlapping
  * semantics. Both operators are row-local projections over codegen'd
  * `regexp_count` / `regexp_replace` — zero shuffles, so at 100 TB the
  * pass is scan-bound and embarrassingly parallel.
  */
object Pii {

  /** (category, pattern, placeholder) — redaction applies in THIS order,
    * so a string claimed by an earlier category is not re-matched by a
    * later one (emails before bare digit runs, IPs before phones).
    */
  val categories: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4",  "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("phone", "\\+[0-9]{7,15}", "<PHONE>"),
    ("id_number", "\\b[0-9]{12,19}\\b", "<ID>"),
  )

  /** Per-row match counts per category plus the total. Null text counts
    * as zero matches (kept, not dropped — the scrub decision usually
    * happens downstream of detection). Every input column except the
    * text rides through, so the audit composes with grouping keys
    * (see `StreamingOps.piiAuditStream`).
    */
  def detect(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    require(df.columns.contains(idCol) && df.columns.contains(textCol))
    val counted = categories.foldLeft(df) {
      case (acc, (name, pat, _)) =>
        acc.withColumn(s"n_$name",
          coalesce(regexp_count(col(textCol), lit(pat)), lit(0)).cast("long"))
    }
    counted.withColumn("n_pii",
        categories.map { case (n, _, _) => col(s"n_$n") }.reduce(_ + _))
      .drop(textCol)
  }

  /** Redacted text: each category's matches replaced by its placeholder,
    * applied in `categories` order. `n_redacted` counts ACTUAL
    * replacements: each category is counted on the text as-of its stage
    * (after the earlier categories' rewrites), so a span claimed by an
    * earlier category — a phone's digit run that would also match the
    * id-number pattern — is never double-counted, unlike [[detect]]
    * which reports each category independently on the raw text.
    */
  def redact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (red, counts) = categories
      .foldLeft((col(textCol), Seq.empty[Column])) {
        case ((acc, cs), (_, pat, ph)) =>
          (regexp_replace(acc, pat, ph),
            cs :+ coalesce(regexp_count(acc, lit(pat)), lit(0)).cast("long"))
      }
    df.select(col(idCol), red.as("redacted"),
      counts.reduce(_ + _).as("n_redacted"))
  }
}
