package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** PII detection and redaction for training corpora — the scrubbing
  * pass a data pipeline runs before text ever reaches a tokenizer.
  * Pattern families: email addresses, NANP-style phone numbers,
  * dotted-quad IPv4 addresses, and US-SSN-shaped ids.
  *
  * Everything is `regexp_extract_all` / `regexp_replace` over built-in
  * functions — map-only, codegen'd, zero shuffles: the operator costs
  * one corpus scan at any scale and composes with column pruning (only
  * the text column is ever read).
  *
  * The patterns are deliberately restricted to the portable regex core
  * (character classes, bounded repetition, `\b`) so the SAME pattern
  * string runs identically under Java regex (Spark) and RE2 (DuckDB /
  * the oracle) — no lookaround, no possessive quantifiers. They are
  * precision-leaning (a match is near-certainly PII); recall-heavier
  * variants (obfuscated emails, international formats) slot in as
  * additional rows of [[patterns]] without touching the plan shape.
  */
object Pii {

  /** local@domain.tld with the usual atom characters. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NNN-NNN-NNNN / NNN.NNN.NNNN (word-bounded). Hyphen and dot
    * separators only — allowing spaces would false-positive on prose
    * number runs.
    */
  val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** Dotted-quad IPv4 (word-bounded; 1-3 digits per octet). */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** NNN-NN-NNNN (US SSN shape). Disjoint from [[PhoneRe]] by group
    * widths (3-2-4 vs 3-3-4), so redaction order cannot flip counts
    * between the two.
    */
  val SsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** (name, pattern, replacement token) — redaction applies these in
    * order; email first so its digit-bearing domains can't be eaten by
    * the numeric patterns.
    */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", EmailRe, "[EMAIL]"),
    ("ssn", SsnRe, "[SSN]"),
    ("phone", PhoneRe, "[PHONE]"),
    ("ipv4", Ipv4Re, "[IP]"))

  private def countOf(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0)))

  /** Per-document counts per pattern family + a `has_pii` flag:
    * `(doc_id, n_email, n_ssn, n_phone, n_ipv4, has_pii)`. Counts are
    * measured on the ORIGINAL text independently per family.
    */
  def detect(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = patterns.map { case (name, re, _) =>
      countOf(col(textCol), re).as(s"n_$name")
    }
    docs.select(col(idCol).as("doc_id") +: counts: _*)
      .withColumn("has_pii",
        patterns.map(p => col(s"n_${p._1}") > 0).reduce(_ || _))
  }

  /** The redacted-text column: every pattern family replaced by its
    * placeholder token, applied in [[patterns]] order.
    */
  def redactedCol(text: Column): Column =
    patterns.foldLeft(text) { case (c, (_, re, token)) =>
      regexp_replace(c, re, token)
    }

  /** `(doc_id, text)` with PII replaced by placeholder tokens — the
    * shape that continues down the pipeline.
    */
  def redact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      redactedCol(col(textCol)).as("text"))

  /** Detection counts AND the redacted text in ONE scan — what the
    * driver surface runs (detect + redact separately would scan the
    * corpus twice for the same columns).
    */
  def report(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = patterns.map { case (name, re, _) =>
      countOf(col(textCol), re).as(s"n_$name")
    }
    docs.select(
      (col(idCol).as("doc_id") +: counts) :+
        redactedCol(col(textCol)).as("text_redacted"): _*)
      .withColumn("has_pii",
        patterns.map(p => col(s"n_${p._1}") > 0).reduce(_ || _))
  }
}
