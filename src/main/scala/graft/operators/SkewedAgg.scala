package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation via salting (SURVEY.md scale notes).
  *
  * Salting splits each key into `saltBuckets` synthetic sub-keys for a
  * parallel partial aggregation, then merges the sub-aggregates in a
  * second (tiny) aggregation — two shuffles, the first balanced, the
  * second carrying one row per (key, salt).
  *
  * MEASURED honesty note (BASELINE.md r5 probe — 10M rows, 90% on one hot
  * key): for ALGEBRAIC aggregates Spark's hash aggregation is already
  * skew-proof — the map-side partial collapses the hot key to one row per
  * map task before the shuffle, so plain groupBy (0.37 s) matches salted
  * (0.43 s; the delta is the extra tiny shuffle). Salting earns its keep
  * where mergeable partial state is NOT available: per-row reduce-side
  * processing (window functions over a hot key — see
  * [[TopKPerKey]]'s bounded-heap partial for that family), engines/paths
  * without map-side combine, and pre-AQE join skew. Only algebraic
  * aggregates decompose this way (sum/count/min/max — avg = salted sum /
  * salted count); the helper takes the partial and final expression lists
  * explicitly to keep that contract visible, and the declared key's
  * equivalence to the plain aggregate is oracle-verified.
  */
object SkewedAgg {

  /** Two-stage salted aggregation.
    * @param partial aggregates computed per (keys, salt) — must be
    *                algebraic (mergeable)
    * @param merge   re-aggregation of the partial columns per keys
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val stage1 = salted.groupBy((keys :+ "__salt").map(col): _*).agg(partial.head, partial.tail: _*)
    stage1.groupBy(keys.map(col): _*).agg(merge.head, merge.tail: _*)
  }

  /** Salted count+sum convenience — the common hot-key shape. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
      saltBuckets: Int = 32): DataFrame =
    saltedAgg(df, Seq(key), saltBuckets,
      partial = Seq(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s")),
      merge = Seq(sum(col("_n")).as("n"), sum(col("_s")).as("s")))

  /** Declared key (`skew_agg`): salted count+sum per event_type — the
    * hot-key defense with a HARD oracle row. The salted two-stage plan is
    * EQUAL to the plain GROUP BY by construction (count/sum are algebraic),
    * so the oracle is the plain aggregate; the salted plan shape (two
    * exchanges, the first keyed on (event_type, __salt)) is pinned by
    * PlanAuditSpec. event_type is the canonical skewed key: a handful of
    * distinct values over the whole events table, which an unsalted agg
    * would reduce on ≤ #types tasks.
    */
  def skewAgg(spark: SparkSession, dir: String): DataFrame =
    saltedCountSum(Tables.events(spark, dir), "event_type", "event_id")
      .orderBy("event_type")
}
