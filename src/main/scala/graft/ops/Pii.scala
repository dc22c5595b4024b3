package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + redaction over document text — the standard
  * pre-release scrub stage of a training-data pipeline (emails, phone
  * numbers, IP addresses → placeholder tokens).
  *
  * Pure per-row codegen'd regex work (`regexp_extract_all` /
  * `regexp_replace`) — no shuffle, scan-bound, so it composes with the
  * quality/language filters in one narrow stage over the corpus. The
  * patterns are deliberately RE2-compatible (no lookarounds or
  * backreferences): the same literal pattern strings run in DuckDB for
  * the cross-engine oracle, so engine/oracle regex-dialect drift is
  * caught by the hash gate.
  *
  * Redaction order is fixed (emails → phones → IPs) and load-bearing:
  * the output of one pass is the input of the next, so both engines
  * must apply the same order for byte-identical redacted text.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def emailCount(text: Column): Column = size(regexp_extract_all(text, lit(EmailRe), lit(0)))
  def phoneCount(text: Column): Column = size(regexp_extract_all(text, lit(PhoneRe), lit(0)))
  def ipCount(text: Column): Column = size(regexp_extract_all(text, lit(IpRe), lit(0)))

  /** Text with every match replaced by its placeholder token. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        PhoneRe, "[PHONE]"),
      IpRe, "[IP]")
}
