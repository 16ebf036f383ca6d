package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar / JSON function surface (SURVEY.md §2.5 R13–R14).
  *
  * All Spark built-ins (`org.apache.spark.sql.functions._`) — codegen'd,
  * no UDFs, narrow per-row transforms that stay inside WholeStageCodegen.
  * The reference reaches these through its SQL planner; we exercise string,
  * date/time, math, conditional (R13) and JSON parsing (R14).
  */
object Funcs {

  /** R13: string (lower/substring/concat), date/time (year/month/
    * date_trunc), math (floor/abs), conditional (CASE WHEN / coalesce+
    * nullif) over orders. floor() is cast to BIGINT on both sides (Spark
    * floor(double)→LONG, DuckDB →DOUBLE — the cast aligns them).
    */
  def scalarFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        lower(col("o_orderpriority")).as("prio_lower"),
        substring(col("o_orderpriority"), 1, 3).as("prio3"),
        concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("status_prio"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        date_trunc("month", col("o_orderdate")).as("mon_start"),
        floor(col("o_totalprice")).as("price_floor"),
        abs(col("o_custkey") - lit(750)).as("key_dist"),
        when(col("o_totalprice") > 300000, "high")
          .when(col("o_totalprice") > 150000, "mid")
          .otherwise("low").as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_co"))
      .orderBy("o_orderkey")

  /** R14: JSON ops — parse `events.props` (a JSON object string) with both
    * get_json_object (path extraction) and from_json (schema'd struct),
    * then aggregate per extracted key. Parsing is per-row and codegen'd;
    * the only shuffle is the groupBy on the extracted value.
    */
  /** [EXT] ordered collection aggregate — `sort_array(collect_set(...))`
    * makes the nondeterministic collect order canonical, then the array is
    * flattened to a space-joined string: array-typed output columns are
    * unhashable in the driver's pandas compare (numpy.ndarray cells), so
    * the canonical string form is what gets oracle-compared (DuckDB
    * `array_to_string(list_sort(list(DISTINCT ...)), ' ')`). */
  def aggCollect(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        concat_ws(" ", sort_array(collect_set(col("l_linestatus")))).as("statuses"),
        concat_ws(" ",
          sort_array(collect_set(year(col("l_shipdate")))).cast("array<string>")).as("ship_years"))
      .orderBy("l_returnflag")

  def jsonFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k_path", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("k_struct", from_json(col("props"), "k LONG", Map.empty[String, String]).getField("k"))
      // null-safe <=> so rows whose props lack 'k' (both parsers NULL) are
      // KEPT and aggregate into the NULL group, matching the oracle's
      // GROUP BY semantics; plain === would silently drop them.
      .filter(col("k_path") <=> col("k_struct"))
      .groupBy(col("k_path").as("k"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("val_sum"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("k")
}
