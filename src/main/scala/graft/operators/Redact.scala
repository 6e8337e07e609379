package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction for training-corpus curation: replace email / phone /
  * IPv4 spans with typed placeholders and count what was removed, in
  * ONE projection pass (regexp_extract_all for the counts and chained
  * regexp_replace for the text — both codegen'd, no UDF, no second
  * scan). The driver testdata corpus is synthetic token text with no
  * PII, so this is a spec-tested utility rather than an oracle query;
  * compose with [[Observe]] to get corpus-level removal tallies as
  * metrics on the main write job.
  *
  * Patterns are deliberately conservative (high precision): curation
  * pipelines prefer leaving a rare exotic format unredacted over
  * mangling ordinary text — recall comes from adding patterns, not
  * loosening them.
  */
object Redact {

  /** local-part@domain.tld (2+ letter TLD). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-ish phone: optional +1, 3-3-4 digits with -, ., or space
    * separators (requires at least one separator so plain 10-digit
    * numbers — ids, timestamps — are not redacted). */
  val PhoneRe = "(?:\\+1[-. ])?\\d{3}[-. ]\\d{3}[-. ]\\d{4}"

  /** Dotted-quad IPv4 (word-bounded). */
  val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  private val patterns: Seq[(String, String, String)] = Seq(
    ("emails", EmailRe, "<EMAIL>"),
    ("phones", PhoneRe, "<PHONE>"),
    ("ips", Ipv4Re, "<IP>"),
  )

  private def countMatches(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0))).cast("long")

  /** Adds `redacted` (scrubbed text) plus `n_emails`/`n_phones`/`n_ips`
    * per-row counts. Order matters: emails first, so the address's
    * domain can't be re-matched as a phone/IP fragment afterwards.
    *
    * Counts and replacements advance together over the SAME
    * progressively-scrubbed expression, so `n_<cat>` is exactly the
    * number of `<CAT>` tags inserted: a phone/IP-shaped span inside an
    * earlier email match (e.g. the `555-123-4567` local part of an
    * address) is already `<EMAIL>` by the time phones/ips are counted,
    * and never inflates the Observe-driven removal tallies. Still one
    * projection pass — the chained regexes are shared subexpressions of
    * a single codegen'd project. */
  def scrub(df: DataFrame, textCol: String): DataFrame = {
    val (counts, scrubbed) =
      patterns.foldLeft((Seq.empty[(String, Column)], col(textCol))) {
        case ((acc, c), (name, re, tag)) =>
          (acc :+ (s"n_$name" -> countMatches(c, re)), regexp_replace(c, re, tag))
      }
    counts.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
      .withColumn("redacted", scrubbed)
  }
}
