package graft

import org.apache.spark.sql.SparkSession

/** One home for SparkSession construction so every entry point (Verify,
  * Bench, tests) runs with identical semantics-critical config:
  *
  *  - `spark.sql.session.timeZone=UTC` — the `events` table is TIMESTAMP_NTZ
  *    derived from raw ns counts; any TZ-dependent cast must see UTC or event
  *    times silently shift (see Tables.events).
  *  - `spark.sql.legacy.parquet.nanosAsLong=true` — `events.ts` is parquet
  *    TIMESTAMP(NANOS) which Spark cannot represent natively; we read the raw
  *    ns long and truncate to µs ourselves.
  *  - `spark.sql.shuffle.partitions` sized to the local core count, not the
  *    200 default — on a real cluster this is instead sized to ~2-3× total
  *    cores / target partition size (~128 MB post-shuffle).
  *  - `spark.sql.legacy.bucketedTableScan.outputOrdering=true` — Spark 3+
  *    stopped reading per-bucket SORT order at planning time by default
  *    (SPARK-28124: confirming it requires listing files to check ONE file
  *    per bucket, a planning cost on tables with many buckets). This
  *    engine's bucketed ingest (BucketedJoin.ensureBucketed) enforces the
  *    one-file invariant, so the listing is O(#buckets) statuses and the
  *    payoff is SortMergeJoins over bucketed facts eliding their Sorts
  *    entirely. Set HERE at session build, not per query — no declared key
  *    mutates session state.
  */
object Engine {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

  def session(appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
