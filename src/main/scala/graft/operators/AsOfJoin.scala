package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — for each left row, the single most recent right row with
  * `right.ts <= left.ts` within the same key ([EXT]; the canonical
  * time-series join Spark has no native operator for; composed from
  * built-ins per the custom-operator preference order, SURVEY.md §4.2(a)).
  *
  * Shape: tag both sides, UNION, then one pass of
  * `last(right-ts, ignoreNulls)` over a per-key time-ordered window — a
  * single hash exchange on the key and a per-key sort, never a range
  * cross-product. Right rows sort BEFORE left rows at equal timestamps so
  * `<=` matches DuckDB's ASOF semantics. At 100 TB this is the merge-join
  * formulation: both sides co-partitioned by key, time-ordered within
  * partitions.
  *
  * The declared query joins each 'click' event to the same user's most
  * recent 'view' at or before it (inner: clicks with no prior view drop).
  */
object AsOfJoin {

  /** Generic as-of: returns left rows + `asof_ts`/`asof_val` columns from
    * the matched right row (null when no right row precedes). */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      rightValCol: String): DataFrame = {
    val l = left
      .withColumn("_side", lit(1))
      .withColumn("_r_ts", lit(null).cast(left.schema(tsCol).dataType))
      .withColumn("_r_val", lit(null).cast(right.schema(rightValCol).dataType))
    var r = right.select(col(keyCol), col(tsCol), col(rightValCol))
      .withColumn("_side", lit(0))
      .withColumn("_r_ts", col(tsCol))
      .withColumnRenamed(rightValCol, "_tmp_val")
      .withColumn("_r_val", col("_tmp_val")).drop("_tmp_val")
    left.columns.filterNot(c => c == keyCol || c == tsCol).foreach { c =>
      r = r.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = l.unionByName(r.select(l.columns.toIndexedSeq.map(col): _*))
    // right rows (_side=0) before left rows at equal ts ⇒ <= semantics;
    // _r_val as the final key makes the pick among right rows that share
    // (key, ts) deterministic (largest value wins) instead of
    // partition-order-dependent.
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col("_side"), col("_r_val"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // One last() over a struct that is NULL for left rows and non-null for
    // every right row (even when the value column itself is NULL), so
    // asof_ts and asof_val always come from the SAME matched right row —
    // two independent last(ignoreNulls) calls would skip different rows
    // when the right value column contains NULLs.
    val rightRow = when(col("_side") === 0, struct(col("_r_ts"), col("_r_val")))
    unioned
      .withColumn("_match", last(rightRow, ignoreNulls = true).over(w))
      .withColumn("asof_ts", col("_match").getField("_r_ts"))
      .withColumn("asof_val", col("_match").getField("_r_val"))
      .filter(col("_side") === 1)
      .drop("_side", "_r_ts", "_r_val", "_match")
  }

  /** Declared query: each click joined to the user's most recent view at
    * or before it. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val clicks = events.filter(col("event_type") === "click")
      .select("user_id", "ts", "event_id")
    val views = events.filter(col("event_type") === "view")
      .select("user_id", "ts", "event_id")
    asOf(clicks, views, "user_id", "ts", "event_id")
      .filter(col("asof_ts").isNotNull) // inner as-of
      .select(col("user_id"), col("ts"), col("event_id"),
        col("asof_ts").as("view_ts"), col("asof_val").as("view_event_id"))
      .orderBy("user_id", "ts", "event_id")
  }
}
