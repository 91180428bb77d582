package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** PII detection and redaction over the `documents` table — the scrubbing
  * pass a training-data pipeline runs before anything else sees the text
  * (public recipe: the regex-based PII filters of C4/Dolma-style corpus
  * tooling — emails, phone numbers, IP addresses, SSN-shaped ids).
  *
  * Pattern portability contract (the [[TextAnalytics.regexTokenStats]]
  * precedent, extended): every pattern uses only explicit character
  * classes, counted repetition, and alternation — constructs with
  * identical leftmost-first semantics under Java regex (Spark codegen)
  * and RE2 (DuckDB) — no lookaround, no backreferences, no `\d`/`\b`
  * shorthands whose Unicode behavior differs between engines. That makes
  * the detection counts AND the redacted-text digest oracle-checkable.
  *
  * Scale shape: embarrassingly parallel — one scan, regexes evaluated
  * inside whole-stage codegen, no shuffle at any SF (the registered query
  * adds only the final presentation sort). The redacted digest keeps the
  * output row slim; [[redactDocs]] is the full-text form a pipeline would
  * actually persist (write-side, never shuffled).
  *
  * The synthetic corpus contains no PII (lowercase word salad), so the
  * registered query correctly reports zero detections there — real
  * behavior is pinned by the PII fixture spec (seeded docs carrying each
  * pattern), the same corpus-vs-fixture split as
  * [[Similarity.embeddingNearDups]]'s demo threshold.
  */
object Pii {

  /** Email: local@domain.tld (tld >= 2 alpha chars). */
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"

  /** SSN-shaped id: 3-2-4 digit groups with dashes. Matched/redacted
    * BEFORE phones: a phone pattern must not consume an SSN's tail.
    */
  val SsnPattern = "[0-9]{3}-[0-9]{2}-[0-9]{4}"

  /** NANP-style phone: 3-3-4 digit groups, one separator class. */
  val PhonePattern = "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"

  /** Dotted-quad IPv4 (shape check only — 999.0.0.1 matches; corpus
    * scrubbing wants recall over strict RFC validity).
    */
  val Ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Redaction order matters and is part of the contract: email first
    * (may contain digit runs), then SSN before phone (both are dashed
    * digit groups; SSN is the more specific shape), IPv4 last.
    */
  val RedactionOrder: Seq[(String, String)] = Seq(
    EmailPattern -> "<EMAIL>",
    SsnPattern -> "<SSN>",
    PhonePattern -> "<PHONE>",
    Ipv4Pattern -> "<IP>")

  /** The redaction chain as a column — shared with
    * [[Curation.curateDocsFull]] and the streaming curation twin so every
    * consumer scrubs with the SAME patterns in the SAME order.
    */
  private[graft] def redacted(text: Column): Column =
    RedactionOrder.foldLeft(text) { case (acc, (p, tag)) =>
      regexp_replace(acc, lit(p), lit(tag))
    }

  /** DuckDB twin of [[redacted]] over a text expression, built from the
    * SAME pattern constants (the patterns use no constructs that escape
    * differently between Java and RE2 string literals), so operator and
    * oracle redaction cannot desynchronize.
    */
  private[operators] def duckRedacted(textExpr: String): String =
    RedactionOrder.foldLeft(textExpr) { case (acc, (p, tag)) =>
      s"regexp_replace($acc, '$p', '$tag', 'g')"
    }

  /** DuckDB count-per-family expression for one pattern. */
  private def duckCount(p: String): String =
    s"len(regexp_extract_all(text, '$p'))"

  /** Per-document PII scan: one count per pattern family, the total, and
    * the md5 of the fully redacted text (digest, not text: the output
    * stays slim and the redaction path is still oracle-verified byte for
    * byte — any divergence in match or replacement semantics flips the
    * hash).
    *
    * Counts are over the RAW text per family (an SSN inside a longer
    * digit context counts once for each family whose shape it matches);
    * redaction applies [[RedactionOrder]] sequentially, so the digest
    * reflects the precedence the scrubbed corpus would actually carry.
    */
  def piiScan(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(EmailPattern), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("text"), lit(SsnPattern), lit(0))).as("n_ssn"),
        size(regexp_extract_all(col("text"), lit(PhonePattern), lit(0))).as("n_phones"),
        size(regexp_extract_all(col("text"), lit(Ipv4Pattern), lit(0))).as("n_ipv4"),
        md5(redacted(col("text"))).as("redacted_md5"))
      .withColumn("pii_total",
        col("n_emails") + col("n_ssn") + col("n_phones") + col("n_ipv4"))
      .orderBy("doc_id")

  /** Full-text redaction — the operator a pipeline persists (write-side;
    * the text column stays scan-local, never shuffled). Not registered as
    * a query (the driver's row hash cannot order long text usefully);
    * the fixture spec asserts placeholder insertion and
    * no-surviving-match directly.
    */
  def redactDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        redacted(col("text")).as("text"))

  // Oracle interpolates the SAME pattern constants as the operator (the
  // Scala string values already carry single-backslash escapes that read
  // identically as DuckDB string literals).
  val oracles: Map[String, String] = Map(
    "q_pii_scan" ->
      s"""SELECT doc_id,
         |       ${duckCount(EmailPattern)} AS n_emails,
         |       ${duckCount(SsnPattern)} AS n_ssn,
         |       ${duckCount(PhonePattern)} AS n_phones,
         |       ${duckCount(Ipv4Pattern)} AS n_ipv4,
         |       md5(${duckRedacted("text")}) AS redacted_md5,
         |       ${duckCount(EmailPattern)}
         |       + ${duckCount(SsnPattern)}
         |       + ${duckCount(PhonePattern)}
         |       + ${duckCount(Ipv4Pattern)}
         |         AS pii_total
         |FROM documents ORDER BY doc_id""".stripMargin
  )
}
