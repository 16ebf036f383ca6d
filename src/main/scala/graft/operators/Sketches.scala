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
  def approxDistinctChecked(spark: SparkSession, dir: String, rsd: Double = 0.02): DataFrame = {
    // The sketches and the exact multi-distinct are SEPARATE aggregations
    // joined on the 3-row group key, not one agg: mixing them forces the
    // HLL partials onto the multi-distinct's Expand plan, whose partial
    // aggregate keys on (flag, suppkey, partkey, gid) — ~1M groups at
    // sf0.1, EACH allocating two ~3 KB HLL buffers (gigabytes of
    // aggregation state for six output rows; guide §5 spill). Split, the
    // HLL pass keeps 6 groups × 2 sketches and the Expand pass carries
    // only counts. Same values, same rows.
    val li = Tables.lineitem(spark, dir)
    val exact = li.groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_suppkey")).as("exact_supp"),
        countDistinct(col("l_partkey")).as("exact_part"),
        count(lit(1)).as("n"))
    val approx = li.groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_suppkey"), rsd).as("approx_supp"),
        approx_count_distinct(col("l_partkey"), rsd).as("approx_part"))
    exact.join(approx, Seq("l_returnflag"))
      .select(col("l_returnflag"),
        col("exact_supp"), col("exact_part"), col("n"),
        (abs(col("approx_supp") - col("exact_supp")).cast("double")
          / col("exact_supp") <= 3 * rsd).as("supp_ok"),
        (abs(col("approx_part") - col("exact_part")).cast("double")
          / col("exact_part") <= 3 * rsd).as("part_ok"))
      .orderBy("l_returnflag")
  }

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

  /** Quantile probe points for the declared key — shared with the oracle
    * SQL via interpolation in SparkEntry (single source of truth). */
  val QuantilePs = Seq(0.25, 0.5, 0.75, 0.95, 0.99)

  /** Declared key (`approx_quantile`) — the same verdict pattern as
    * `approx_distinct`: one row per probe point carrying what IS
    * engine-portable (count, min, max — raw values, no arithmetic) plus a
    * boolean certifying the GK estimate sits within 1% relative error of
    * the EXACT interpolated percentile computed Spark-side in the same
    * query. The oracle emits the portable columns + literal TRUE, so a
    * sketch regression turns the row red. Exact `percentile` is the
    * verification harness (full sort state per group); the production
    * sketch path is [[approxQuantiles]] — mergeable fixed-size state, the
    * thing that matters when the shuffle would otherwise carry every value.
    */
  def approxQuantileChecked(spark: SparkSession, dir: String,
      accuracy: Int = 10000): DataFrame = {
    val psSql = QuantilePs.mkString(", ")
    Tables.orders(spark, dir)
      .agg(
        expr(s"approx_percentile(o_totalprice, array($psSql), $accuracy)").as("ap"),
        expr(s"percentile(o_totalprice, array($psSql))").as("ep"),
        count(lit(1)).as("n"), min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
      .select(col("n"), col("lo"), col("hi"),
        posexplode(arrays_zip(col("ap"), col("ep"))))
      .select(
        element_at(array(QuantilePs.map(lit): _*), col("pos") + 1).as("p"),
        col("n"), col("lo"), col("hi"),
        (abs(col("col.ap") - col("col.ep")) / col("col.ep") <= 0.01).as("q_ok"))
      .orderBy("p")
  }
}
