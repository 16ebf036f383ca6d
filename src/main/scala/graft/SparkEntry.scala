package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in [[queries]] is an operator from SURVEY.md §2's Query-key
  * column; [[oracleSql]] carries the equivalent DuckDB SQL for the driver's
  * hash-compare. Column names and row order are aligned on both sides
  * (explicit aliases + ORDER BY on a unique key).
  */
object SparkEntry {

  /** Flagship query (SURVEY.md §7 Phase 1): session windows + COUNT,
    * the reference's one real query (StreamingFlinkSQL.java:35-39).
    * Driver smoke-checks rows > 0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    Windows.sessionCount(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "session_count" -> (Windows.sessionCount _),
    "session_user"  -> (Windows.sessionUser _),
    "tumble_sum"    -> (Windows.tumbleSum _),
    "slide_agg"     -> (Windows.slideAgg _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "session_count" ->
      """WITH s AS (
        |  SELECT ts, event_id,
        |    CASE WHEN LAG(ts) OVER (ORDER BY ts, event_id) IS NULL
        |           OR ts - LAG(ts) OVER (ORDER BY ts, event_id) > INTERVAL 5 SECOND
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |), g AS (
        |  SELECT ts, SUM(brk) OVER (ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM s
        |)
        |SELECT MIN(ts) AS window_start, MAX(ts) + INTERVAL 5 SECOND AS window_end,
        |       CAST(COUNT(*) AS BIGINT) AS total
        |FROM g GROUP BY sid ORDER BY window_start""".stripMargin,
    "session_user" ->
      """WITH s AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |           OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |), g AS (
        |  SELECT user_id, ts, event_id,
        |         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM s
        |)
        |SELECT user_id, MIN(ts) AS window_start, MAX(ts) + INTERVAL 30 MINUTE AS window_end,
        |       CAST(COUNT(*) AS BIGINT) AS n_events, CAST(SUM(event_id) AS BIGINT) AS id_sum
        |FROM g GROUP BY user_id, sid ORDER BY user_id, window_start""".stripMargin,
    "tumble_sum" ->
      """SELECT ws AS window_start, ws + INTERVAL 10 SECOND AS window_end,
        |       CAST(SUM(event_id) AS BIGINT) AS id_sum, CAST(COUNT(*) AS BIGINT) AS n
        |FROM (SELECT make_timestamp((epoch_ms(ts) // 10000) * 10000 * 1000) AS ws, event_id FROM events)
        |GROUP BY ws ORDER BY ws""".stripMargin,
    "slide_agg" ->
      """SELECT event_type, ws AS window_start, ws + INTERVAL 1 HOUR AS window_end,
        |       CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(event_id) AS BIGINT) AS id_sum
        |FROM (
        |  SELECT event_type, event_id,
        |         make_timestamp(((epoch_ms(ts) // 900000) - k) * 900000 * 1000) AS ws
        |  FROM events, (SELECT UNNEST(range(4)) AS k)
        |)
        |GROUP BY event_type, ws ORDER BY event_type, ws""".stripMargin,
  )
}
