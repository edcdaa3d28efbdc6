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
  * Replacement order is part of the contract (email → IPv6 → IPv4 →
  * phone): email redaction must run before the phone pattern can see
  * digit runs, IPv6 before IPv4 so a mapped-v4 tail can't be half-eaten,
  * and counts are taken BEFORE any replacement so they report matches in
  * the original text.
  */
object PiiScrub {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Phone forms: international `+1-555-123-4567`, parenthesized
    * `(555) 123-4567`, dotted `555.123.4567`, dashed `555-123-4567`, plus
    * the short international `+NN-NNN-NNNN`. Alternative order matters and
    * is identical under Java and RE2 (both leftmost-FIRST by default): the
    * long form is tried before the short fallback. The digit-initial
    * branch carries a `\b` anchor (valid in both Java and RE2) so a
    * phone-shaped SUFFIX inside a longer digit run is not redacted
    * mid-number (`9555.123.4567` must stay intact, not become
    * `9<PHONE>`); the paren and `+` branches are anchored by their
    * non-word first character already.
    */
  val PhoneRe = "(\\+\\d{1,2}[-. ])?(\\(\\d{3}\\) ?|\\b\\d{3}[-.])\\d{3}[-.]\\d{4}" +
    "|\\+\\d{1,2}-\\d{3}-\\d{3,4}(-\\d{4})?"

  /** IPv6: full 8-group form or `::`-compressed with a trailing group
    * (`2001:db8::1`, `fe80::a:b`). Hex groups only — the dotted tail of a
    * v4-mapped address is left to [[Ipv4Re]] (scrub order covers it).
    * `\b` anchors hold because both ends are hex word chars.
    *
    * The compressed alternatives are ENUMERATED per left-group count k
    * (longest first — leftmost-first alternation in both Java and RE2
    * mirrors the old greedy quantifier) with the right side bounded to
    * `7 - k` groups, so a match never spans more groups than a valid
    * address can hold (`::` stands for >= 1 zero group, hence
    * left + right <= 7): `1:2:3:4:5:6::7:8:9:a` no longer swallows 10
    * groups — only its longest valid-shaped prefix (`…::7`) is redacted
    * and the trailing junk survives verbatim.
    *
    * DOCUMENTED LIMIT: forms that START or END with `::` (`::1`,
    * `::ffff:0:1`, `2001:db8::`) are NOT matched — anchoring a match at a
    * bare `:` needs lookbehind/lookahead, which the Java∩RE2 oracle
    * subset lacks, and consuming the preceding character instead would
    * corrupt the replacement. Spec-pinned so the gap is explicit.
    */
  val Ipv6Re: String = {
    val h = "[0-9A-Fa-f]{1,4}"
    val compressed = (6 to 1 by -1)
      .map(k => s"($h:){$k}:$h(:$h){0,${6 - k}}")
      .mkString("|")
    s"\\b(($h:){7}$h|$compressed)\\b"
  }

  /** Adds `n_email` / `n_ip` / `n_ipv6` / `n_phone` counts (over the
    * ORIGINAL text) and a `scrubbed` column with typed placeholders
    * substituted.
    */
  def scrub(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_email", regexp_count(t, lit(EmailRe)).cast("long"))
      .withColumn("n_ip", regexp_count(t, lit(Ipv4Re)).cast("long"))
      .withColumn("n_ipv6", regexp_count(t, lit(Ipv6Re)).cast("long"))
      .withColumn("n_phone", regexp_count(t, lit(PhoneRe)).cast("long"))
      .withColumn("scrubbed",
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(t, EmailRe, "<EMAIL>"),
              Ipv6Re, "<IPV6>"),
            Ipv4Re, "<IP>"),
          PhoneRe, "<PHONE>"))
  }
}
