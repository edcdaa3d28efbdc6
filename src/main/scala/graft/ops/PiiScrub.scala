package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII redaction — the compliance pass every public-crawl training
  * pipeline runs before tokenization (emails / IPv4s / phone numbers →
  * typed placeholder tokens, plus per-doc redaction counts for the audit
  * table).
  *
  * Pure `regexp_replace`/`regexp_count` Column expressions end to end: the
  * whole pass stays inside whole-stage codegen, is map-only (zero
  * shuffles), and scales embarrassingly — exactly the shape wanted for a
  * full-corpus rewrite at 10^12 documents. Patterns are restricted to the
  * regex subset where Java (Spark) and RE2 (DuckDB oracle) agree: character
  * classes, bounded repetition, `\b` word boundaries; no backreferences or
  * lookaround.
  *
  * Replacement order is part of the contract (email → IPv4 → phone):
  * email redaction must run before the phone pattern can see digit runs,
  * and counts are taken BEFORE any replacement so they report matches in
  * the original text.
  */
object PiiScrub {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+\\d{1,2}-\\d{3}-\\d{3,4}(-\\d{4})?"

  /** Adds `n_email` / `n_ip` / `n_phone` counts (over the ORIGINAL text)
    * and a `scrubbed` column with typed placeholders substituted.
    */
  def scrub(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_email", regexp_count(t, lit(EmailRe)).cast("long"))
      .withColumn("n_ip", regexp_count(t, lit(Ipv4Re)).cast("long"))
      .withColumn("n_phone", regexp_count(t, lit(PhoneRe)).cast("long"))
      .withColumn("scrubbed",
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailRe, "<EMAIL>"),
            Ipv4Re, "<IP>"),
          PhoneRe, "<PHONE>"))
  }
}
