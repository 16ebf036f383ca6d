package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII redaction for LLM training-data curation (SURVEY.md §2.7 [EXT]) —
  * the standard scrub stage between quality filtering and dedup: replace
  * email addresses, IPv4 addresses, and phone numbers with typed
  * placeholder tokens, and count what was removed per class.
  *
  * Patterns live in the Java-regex ∩ RE2 common subset (the
  * [[TextOps.BpePattern]] discipline — no lookaround, no `\s` whose class
  * membership differs between engines, character classes spelled
  * explicitly), so the DuckDB oracle runs the SAME patterns and the two
  * engines can't silently diverge on what counts as PII.
  *
  * Scale shape: one narrow codegen'd projection per document — three
  * regex scans and three `regexp_replace` passes, no shuffle, no UDF,
  * embarrassingly parallel; the per-row cost is identical at sf0.01 and
  * 100 TB. Classes apply in a FIXED order (email → IP → phone), each
  * counting and replacing over the PREVIOUS class's output, so a digit
  * run inside an already-redacted email can't double-count as a phone;
  * the placeholders contain no digits or '@' and therefore can't create
  * new matches for later classes.
  */
object Redact {

  /** Email: local part, '@', dotted domain with a ≥2-letter TLD. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** IPv4: four dotted 1-3 digit octets, word-bounded so longer dotted
    * number chains don't shed spurious matches (`\b` means the same thing
    * in Java regex and RE2). */
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Phone: E.164 international form (`+` then 7-15 digits) or the dashed
    * NANP-ish form `NNN-NNN-NNNN`, word-bounded. */
  val PhoneRe = "\\+[0-9]{7,15}\\b|\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  val EmailTag = "<EMAIL>"
  val IpTag = "<IP>"
  val PhoneTag = "<PHONE>"

  /** Scrubbed text for ANY string column — the composable stage
    * ([[Curation.curate]] applies it before quality scoring when asked). */
  def clean(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(EmailRe), lit(EmailTag)),
        lit(Ipv4Re), lit(IpTag)),
      lit(PhoneRe), lit(PhoneTag))

  /** The redaction transform on ANY (doc_id, text) frame: appends
    * per-class counts, the total, the scrubbed text, and its md5 (the
    * oracle-comparable digest — shipping full text through the hash gate
    * would pin row content, the md5 pins it in 32 chars). */
  def redact(docs: DataFrame): DataFrame = {
    val afterEmail = regexp_replace(col("text"), lit(EmailRe), lit(EmailTag))
    val afterIp = regexp_replace(afterEmail, lit(Ipv4Re), lit(IpTag))
    docs
      .withColumn("n_email", size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))))
      .withColumn("n_ip", size(regexp_extract_all(afterEmail, lit(Ipv4Re), lit(0))))
      .withColumn("n_phone", size(regexp_extract_all(afterIp, lit(PhoneRe), lit(0))))
      .withColumn("n_redactions", col("n_email") + col("n_ip") + col("n_phone"))
      .withColumn("clean", regexp_replace(afterIp, lit(PhoneRe), lit(PhoneTag)))
  }

  /** The synthetic corpus carries no PII, so the declared key PLANTS some
    * deterministically (the [[Contamination]] discipline): every doc_id
    * divisible by these moduli gets a synthesized email / IP / phone
    * appended. The oracle plants the identical strings by the identical
    * rule, so the redaction counts and the cleaned-text digests are hard
    * rows, not all-zeros. */
  val EmailMod = 5
  val IpMod = 7
  val PhoneMod = 11

  private[operators] def plantPii(docs: DataFrame): DataFrame =
    docs.withColumn("text",
      concat(col("text"),
        when(col("doc_id") % EmailMod === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % IpMod === 0,
          concat(lit(" from 10.0."), col("doc_id") % 256, lit(".1")))
          .otherwise(lit("")),
        when(col("doc_id") % PhoneMod === 0,
          concat(lit(" call 555-01"), lpad(col("doc_id") % 10, 1, "0"), lit("-"),
            lpad(col("doc_id") % 10000, 4, "0")))
          .otherwise(lit(""))))

  /** Declared key (`redact`): plant → scrub → per-doc counts + cleaned
    * digest over the documents table. */
  def redactQuery(spark: SparkSession, dir: String): DataFrame =
    redact(plantPii(Tables.documents(spark, dir).select("doc_id", "text")))
      .select(col("doc_id"), col("n_email"), col("n_ip"), col("n_phone"),
        col("n_redactions"), md5(col("clean")).as("clean_fp"))
      .orderBy("doc_id")
}
