package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the compliance pass every training-data
  * pipeline runs before a corpus ships: find email addresses, phone
  * numbers, and IPv4 addresses, count them per document, and emit a
  * redacted copy with each span replaced by a type marker.
  *
  * All patterns are RE2-safe (character classes and bounded quantifiers
  * only — no lookaround, no backreferences), so Java's regex engine and
  * RE2-based engines (DuckDB, Go, Trino) match identical spans — which is
  * what makes the redacted-text fingerprint a cross-engine oracle
  * surface.
  *
  * Scale shape: narrow codegen'd regexp expressions over one scan — no
  * shuffle, no UDF; composes with predicate pushdown (e.g. scanning only
  * one source partition).
  */
object Pii {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
  val Ipv4Pattern = "(?:[0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Per-document PII counts, a flag, and the redacted text's length and
    * fingerprint (redaction order: emails, then phones, then IPv4 — an
    * email's domain can otherwise be half-eaten by the IP pattern).
    *
    * Each count runs over the PREVIOUS stage's redacted text, not the raw
    * input, so a span consumed by an earlier pattern is never counted
    * again by a later one (a dotted-quad inside an email domain is one
    * email, zero IPs) — every count equals the number of markers that
    * stage actually inserted, and n_emails+n_phones+n_ips equals the
    * total marker count in `redacted`. Whole-stage codegen's
    * subexpression elimination evaluates each intermediate once.
    *
    * No trailing sort: the operator is row-local, so it runs unchanged
    * over a streaming DataFrame (callers order batch output). */
  def scan(docs: DataFrame, idCol: String = "doc_id",
           textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val afterEmail = regexp_replace(t, lit(EmailPattern), lit("<EMAIL>"))
    val afterPhone = regexp_replace(afterEmail, lit(PhonePattern), lit("<PHONE>"))
    val redacted = regexp_replace(afterPhone, lit(Ipv4Pattern), lit("<IP>"))

    docs.select(
      col(idCol).as("doc_id"),
      regexp_count(t, lit(EmailPattern)).cast("bigint").as("n_emails"),
      regexp_count(afterEmail, lit(PhonePattern)).cast("bigint").as("n_phones"),
      regexp_count(afterPhone, lit(Ipv4Pattern)).cast("bigint").as("n_ips"),
      redacted.as("redacted"))
      .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"),
        (col("n_emails") + col("n_phones") + col("n_ips") > 0).as("has_pii"),
        length(col("redacted")).cast("bigint").as("redacted_len"),
        md5(col("redacted")).as("redacted_fp"))
  }
}
