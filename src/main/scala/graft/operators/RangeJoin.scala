package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Banded range join ([EXT]; prompt/SURVEY's "range join" family).
  *
  * A join on `|a.ts - b.ts| <= W` has no equi-key, so Catalyst would plan
  * key-only join + post-filter (fine) or, keyless, a cartesian product
  * (disaster). The scale-safe shape turns the range predicate into an
  * EQUI-join: bucket time into width-W bands and join on
  * (key, band ± 1) — every true pair shares or neighbors a band, so the
  * equi-join finds all candidates and an exact filter keeps the real
  * ones. Cost: 3× candidate fan-out on one side, in exchange for a hash
  * join instead of a cross-product — the standard trick for genomic
  * interval overlap / time-proximity joins at scale.
  */
object RangeJoin {

  /** Pairs of (error, click) events by the same user within `windowSec`
    * seconds (default 4 h — sized to the testdata event density) of each other
    * (either direction). */
  def rangeJoin(spark: SparkSession, dir: String, windowSec: Long = 14400L): DataFrame = {
    val wUs = windowSec * 1000000L
    val events = Tables.events(spark, dir)
    def side(tpe: String, tsName: String, idName: String) = events
      .filter(col("event_type") === tpe)
      .select(col("user_id"), col("ts").as(tsName), col("event_id").as(idName),
        unix_micros(col("ts").cast("timestamp")).as(s"${tsName}_us"))
    val errors = side("error", "err_ts", "err_id")
      .withColumn("band", expr(s"err_ts_us div ${wUs}L"))
    val clicks = side("click", "click_ts", "click_id")
      // candidate bands: own ± 1 — any pair within W shares or neighbors a band
      .withColumn("band", explode(array(
        expr(s"click_ts_us div ${wUs}L - 1"),
        expr(s"click_ts_us div ${wUs}L"),
        expr(s"click_ts_us div ${wUs}L + 1"))))
    errors.join(clicks, Seq("user_id", "band"))
      .filter(abs(col("err_ts_us") - col("click_ts_us")) <= wUs)
      .select(col("user_id"), col("err_ts"), col("err_id"),
        col("click_ts"), col("click_id"))
      .distinct() // a pair can match via two shared bands
      .orderBy("user_id", "err_ts", "click_ts")
  }
}
