package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (see TESTDATA.md / FIXTURES.md §B).
  *
  * All reads go through here so scan-level tuning (partition sizing, schema
  * pruning) has one home. Filters/projections are left to Catalyst pushdown —
  * callers express them declaratively and `.explain` shows `PushedFilters`.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` has shipped in two encodings across testdata generations:
    * parquet TIMESTAMP(NANOS, isAdjustedToUTC=false) — which Spark can only
    * read via the `nanosAsLong` escape hatch (raw ns count as LongType) —
    * and plain TIMESTAMP(MICROS) (TimestampType/TimestampNTZType). The
    * loader must not assume either: it branches on the type Spark actually
    * inferred and normalizes both to µs TIMESTAMP_NTZ, the truncation DuckDB
    * applies, so oracle comparisons line up regardless of the file's vintage.
    *
    * `nanosAsLong` stays set unconditionally BEFORE the read: it is required
    * for the ns encoding (without it the read fails at schema inference) and
    * a no-op for µs files. Both confs are also set by [[graft.Engine.session]]
    * at session build; the defensive set here covers the driver's smoke path,
    * which calls `SparkEntry.entry` with an externally built session
    * (documented session-level mutation: a non-UTC zone silently shifts
    * event times).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if (s.conf.get("spark.sql.session.timeZone") != "UTC")
      s.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = table(s, d, "events")
    val tsExpr = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // ns-encoded file read through the escape hatch: truncate ns → µs
        "cast(timestamp_micros(ts div 1000) as timestamp_ntz)"
      case _ =>
        // native µs timestamp (with or without zone): normalize to NTZ
        "cast(ts as timestamp_ntz)"
    }
    raw.withColumn("ts", expr(tsExpr))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Staleness fingerprint for a persisted serving artifact keyed on a
    * source table (BPE merge table, IVFADC index, band index): an md5 over
    * every data file's sorted (name, size, mtime) triple. Byte-total alone
    * is too weak — a regenerated corpus with different CONTENT but the same
    * total would silently serve a stale model; mtime changes on any rewrite,
    * so content regeneration always rotates the artifact path. */
  def corpusFingerprint(dir: String, name: String): String =
    pathFingerprint(s"$dir/$name.parquet")

  /** [[corpusFingerprint]] over an arbitrary parquet file/directory path
    * (fixture tables that don't live in a testdata dir). */
  def pathFingerprint(path: String): String = {
    val root = new java.io.File(path)
    val files = Option(root.listFiles()).map(_.toSeq)
      .getOrElse(if (root.isFile) Seq(root) else Seq.empty)
      .filter(_.isFile).sortBy(_.getName)
    val sig = files.map(f => s"${f.getName}:${f.length()}:${f.lastModified()}").mkString("|")
    val md = java.security.MessageDigest.getInstance("MD5").digest(sig.getBytes("UTF-8"))
    md.take(8).map(b => f"${b & 0xff}%02x").mkString
  }
}
