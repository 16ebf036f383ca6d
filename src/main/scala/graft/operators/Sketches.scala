package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate aggregates for 100 TB interactive work (SURVEY.md §2.4
  * [EXT] completion): HyperLogLog++ distinct counts and approximate
  * quantiles. Both are Spark built-ins backed by mergeable sketches —
  * fixed-size state per group regardless of input cardinality, so at scale
  * the shuffle carries kilobyte sketches where exact distinct would carry
  * the full key sets (`count(DISTINCT x)` plans an Expand + second shuffle).
  * Not oracle-able (estimator internals differ across engines) — verified
  * against exact results with error bounds in SketchesSpec.
  */
object Sketches {

  /** HLL distinct suppliers/parts per return flag — `rsd` is the target
    * relative standard deviation. Sketches only: a single hash-agg pass,
    * no Expand, constant state per group. */
  def approxDistinct(spark: SparkSession, dir: String, rsd: Double = 0.02): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_suppkey"), rsd).as("approx_supp"),
        approx_count_distinct(col("l_partkey"), rsd).as("approx_part"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** Declared `approx_distinct` form — oracle-able: emits the EXACT
    * distinct counts (DuckDB `COUNT(DISTINCT …)`) alongside booleans
    * certifying the HLL estimate landed within 3·rsd of exact. The oracle
    * emits literal TRUE, so an estimator regression turns the row red —
    * a hard correctness row for a sketch whose internals are legitimately
    * not SQL-expressible. The exact distincts make THIS query plan an
    * Expand + second shuffle; that is the verification harness, not the
    * scale path — production code uses [[approxDistinct]] (sketch only,
    * single hash-agg pass). */
  def approxDistinctChecked(spark: SparkSession, dir: String, rsd: Double = 0.02): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_suppkey")).as("exact_supp"),
        countDistinct(col("l_partkey")).as("exact_part"),
        count(lit(1)).as("n"),
        approx_count_distinct(col("l_suppkey"), rsd).as("approx_supp"),
        approx_count_distinct(col("l_partkey"), rsd).as("approx_part"))
      .select(col("l_returnflag"),
        col("exact_supp"), col("exact_part"), col("n"),
        (abs(col("approx_supp") - col("exact_supp")).cast("double")
          / col("exact_supp") <= 3 * rsd).as("supp_ok"),
        (abs(col("approx_part") - col("exact_part")).cast("double")
          / col("exact_part") <= 3 * rsd).as("part_ok"))
      .orderBy("l_returnflag")

  /** Spec-only: sketch next to exact multi-distinct (the exact form plans
    * Expand + a second shuffle — the thing the sketch avoids at scale). */
  def approxVsExact(spark: SparkSession, dir: String, rsd: Double = 0.02): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_suppkey"), rsd).as("approx_supp"),
        countDistinct(col("l_suppkey")).as("exact_supp"),
        approx_count_distinct(col("l_partkey"), rsd).as("approx_part"),
        countDistinct(col("l_partkey")).as("exact_part"))
      .orderBy("l_returnflag")

  /** Approximate percentiles of order value (GK sketch via
    * approx_percentile/percentile_approx). `accuracy` trades state size
    * for error ≤ 1/accuracy in rank space. */
  def approxQuantiles(spark: SparkSession, dir: String, accuracy: Int = 10000): DataFrame =
    Tables.orders(spark, dir)
      .agg(
        expr(s"approx_percentile(o_totalprice, array(0.5, 0.95, 0.99), $accuracy)").as("approx_p"),
        expr("percentile(o_totalprice, array(0.5, 0.95, 0.99))").as("exact_p"))
}
