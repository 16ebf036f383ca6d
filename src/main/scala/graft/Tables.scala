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
  /** `events.ts` is parquet TIMESTAMP(NANOS, isAdjustedToUTC=false), which
    * Spark cannot represent natively (µs precision). Read the raw ns count
    * via the `nanosAsLong` escape hatch and truncate to µs TIMESTAMP_NTZ —
    * the same truncation DuckDB applies, so oracle comparisons line up.
    *
    * Both configs are set by [[graft.Engine.session]] at session build; our
    * own entry points never hit the fallback below. The driver, however,
    * smoke-runs `SparkEntry.entry(spark)` with an EXTERNALLY built session —
    * for that path we set the two semantics-critical confs defensively
    * (documented session-level mutation: without nanosAsLong the read
    * fails outright, and a non-UTC zone silently shifts event times).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if (s.conf.get("spark.sql.session.timeZone") != "UTC")
      s.conf.set("spark.sql.session.timeZone", "UTC")
    table(s, d, "events")
      .withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
