package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregations — the analytical core of the reference
  * (SURVEY.md §2.3).
  *
  * Batch forms run over the `events` table; the streaming forms (same plan
  * shape over a streaming DataFrame) live in [[graft.streaming.StreamingOps]].
  *
  * Scale notes: keyed `groupBy(key, window(...))` / `groupBy(key,
  * session_window(...))` hash-shuffle on the key with map-side partial
  * aggregation — parallel, the shape we want at 100 TB. UNKEYED
  * `session_window` is NOT that shape: it plans
  * `Sort → Exchange SinglePartition → MergingSessions` (every event in one
  * task), so the flagship uses [[Sessionize.globalSessions]] — a two-phase
  * gaps-and-islands whose only single-partition pass is over O(#buckets)
  * session summaries. The reference's `windowAll` forces parallelism 1
  * (reference: CassandraPojoSinkStreaming.java:66-68); Spark's
  * `groupBy(window)` equivalent stays parallel with identical results.
  *
  * The trailing `orderBy` in each query exists for oracle-hash determinism
  * (harness requirement); production pipelines would drop it.
  */
object Windows {

  /** Flagship: gap-based session windows + COUNT, two-phase scale-safe form.
    *
    * Reference: StreamingFlinkSQL.java:35-39 —
    * `SESSION(TABLE SourceTable, DESCRIPTOR(event_time), INTERVAL '5' SECOND)`
    * with `COUNT(f0)` projected to `(window_start, window_end, total)`.
    * Here: global 5 s-gap sessions over `events.ts`, counting events.
    * Semantics match built-in `session_window` exactly (events precisely
    * `gap` apart merge; `window_end = last_ts + gap`) — asserted against the
    * built-in in WindowsSpec; hash-matched against the DuckDB oracle.
    */
  def sessionCount(spark: SparkSession, dir: String): DataFrame =
    Sessionize.globalSessions(
        Tables.events(spark, dir).select("ts"),
        "ts", gapUs = 5000000L, bucketUs = 3600000000L /* 1 h */)
      .select(
        expr("cast(timestamp_micros(s_start_us) as timestamp_ntz)").as("window_start"),
        expr("cast(timestamp_micros(s_last_us + 5000000) as timestamp_ntz)").as("window_end"),
        col("total"))
      .orderBy("window_start")

  /** Unkeyed session windows via the BUILT-IN `session_window` — kept as the
    * semantic reference for [[sessionCount]] (WindowsSpec asserts equality on
    * sf0.001) and as documentation of the single-partition plan it produces.
    * Not a declared query key; do not use at scale.
    */
  def sessionCountBuiltin(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "5 seconds"))
      .agg(count(col("event_id")).as("total"))
      .select(
        col("session_window.start").as("window_start"),
        col("session_window.end").as("window_end"),
        col("total"))
      .orderBy("window_start")

  /** Keyed session windows — sessions per user with a 30-minute gap.
    * Generalizes the flagship to the keyed case (what a real pipeline runs).
    * Plan: hash exchange on user_id with map-side partial agg — parallel;
    * skewed users are the thing to watch at scale (AQE skew handling applies).
    */
  def sessionUser(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), sum(col("event_id")).as("id_sum"))
      .select(
        col("user_id"),
        col("session_window.start").as("window_start"),
        col("session_window.end").as("window_end"),
        col("n_events"), col("id_sum"))
      .orderBy("user_id", "window_start")

  /** Tumbling event-time window + associative reduce (sum).
    *
    * Reference: CassandraPojoSinkStreaming.java:66-68 —
    * `windowAll(TumblingEventTimeWindows.of(Time.seconds(10))).reduce((a,b) -> Pojo(a.id+b.id))`.
    * Batch analog: 10 s tumbling windows over `events.ts` summing `event_id`
    * (integer-exact, so the DuckDB oracle hash-matches bit-for-bit).
    * Tumbling windows are a plain hash-agg on the window key — parallel.
    */
  def tumbleSum(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "10 seconds"))
      .agg(sum(col("event_id")).as("id_sum"), count(lit(1)).as("n"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("id_sum"), col("n"))
      .orderBy("window_start")

  /** Sliding (hopping) windows — 1 hour window, 15 minute slide, per
    * event_type. Not in the reference surface but part of any complete
    * window family; each row lands in window_size/slide buckets (4× row
    * expansion before the partial agg — inherent to hopping windows).
    */
  def slideAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"))
      .select(
        col("event_type"),
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("n"), col("id_sum"))
      .orderBy("event_type", "window_start")
}
