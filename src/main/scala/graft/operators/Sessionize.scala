package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global (unkeyed) gap-based sessionization.
  *
  * Spark's built-in `groupBy(session_window(...))` with NO extra keys requires
  * an AllTuples distribution, so the physical plan is
  * `Sort → Exchange SinglePartition → MergingSessions`: every event row ships
  * to one task. Confirmed scale-killer at 100 TB (VERDICT r1). The keyed form
  * is fine (hash-partitions on the key) — this helper exists for the unkeyed
  * flagship.
  *
  * Strategy (two-phase gaps-and-islands):
  *
  *  1. Bucket events by a coarse time bucket (`bucketUs` ≫ `gapUs`) and
  *     sessionize per bucket with `lag` + running sum — fully parallel,
  *     hash-partitioned on the bucket.
  *  2. A session that starts > gap after its bucket's start AND ends > gap
  *     before the bucket's end can never merge across buckets — it is FINAL
  *     after phase 1 (the overwhelming majority when sessions ≪ bucket).
  *  3. Only boundary-touching sessions (≤ a handful per bucket, O(#buckets)
  *     total — independent of #events) go through a final interval-merge
  *     pass. That pass is a single-partition window over session SUMMARIES
  *     (3 longs each), not raw events — the residual is bounded by bucket
  *     count, so at 1000 executors × 100 TB it stays trivially small.
  *
  * Merge semantics match `session_window` / Flink merging session windows:
  * events exactly `gap` apart MERGE (break only when the delta is strictly
  * greater than the gap) — verified empirically on Spark 4.1.2 with an
  * exact-gap fixture (see WindowsSpec).
  *
  * Reference: StreamingFlinkSQL.java:35-39 (SESSION TVF semantics).
  */
object Sessionize {

  /** @param df      input with an event-time column castable to TIMESTAMP
    *                (UTC session pinned by [[graft.Engine]])
    * @param tsCol   event-time column name
    * @param gapUs   session gap in microseconds
    * @param bucketUs phase-1 bucket width in microseconds; must be > gapUs
    * @return columns `s_start_us, s_last_us, total` — session first/last
    *         event time (µs since epoch) and event count
    */
  def globalSessions(df: DataFrame, tsCol: String, gapUs: Long, bucketUs: Long): DataFrame = {
    require(bucketUs > gapUs, s"bucket ($bucketUs) must exceed gap ($gapUs)")
    val us  = unix_micros(col(tsCol).cast("timestamp"))
    val ev  = df.select(us.as("us")).withColumn("b", expr(s"us div ${bucketUs}L"))

    // Phase 1: per-bucket sessionization. Shuffle key = bucket → parallel.
    val wOrd = Window.partitionBy("b").orderBy("us")
    val brk = when(lag(col("us"), 1).over(wOrd).isNull
      .or(col("us") - lag(col("us"), 1).over(wOrd) > gapUs), 1L).otherwise(0L)
    val sessions = ev
      .withColumn("sid", sum(brk).over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("b"), col("sid"))
      .agg(min("us").as("s_start_us"), max("us").as("s_last_us"), count(lit(1)).as("total"))
      .withColumn("interior",
        (col("s_start_us") - col("b") * bucketUs > gapUs) &&
        ((col("b") + 1) * bucketUs - col("s_last_us") > gapUs))
      // Two consumers below (interior / boundary split) — persist the
      // summaries so phase 1 (scan + shuffle + window) runs once. Summaries
      // are O(#sessions) ≪ O(#events), so this is cheap even at scale.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val finalInterior = sessions.filter(col("interior"))
      .select("s_start_us", "s_last_us", "total")

    // Phase 2: interval-merge the boundary sessions. Session summaries are
    // monotone in (s_start_us, s_last_us) across buckets, so a plain lag
    // suffices. Single-partition, but over O(#buckets) rows only.
    val wAll = Window.orderBy("s_start_us")
    val brk2 = when(lag(col("s_last_us"), 1).over(wAll).isNull
      .or(col("s_start_us") - lag(col("s_last_us"), 1).over(wAll) > gapUs), 1L).otherwise(0L)
    val merged = sessions.filter(!col("interior"))
      .select("s_start_us", "s_last_us", "total")
      .withColumn("gid", sum(brk2).over(wAll.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("gid")
      .agg(min("s_start_us").as("s_start_us"), max("s_last_us").as("s_last_us"),
        sum("total").as("total"))
      .select("s_start_us", "s_last_us", "total")

    finalInterior.unionAll(merged)
  }
}
