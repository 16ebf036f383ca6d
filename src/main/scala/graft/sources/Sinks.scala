package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sink operators (SURVEY.md §2.2).
  *
  * K1 file_sink — row-format file sink with round-trip verification
  *   (reference: DataStreamJob.java:51-59). The reference's custom Encoder
  *   writes `element.byteValue()` — a LOSSY low-byte truncation quirk we
  *   document but do not copy: our sink writes faithful parquet. The
  *   declared query writes a filtered projection, re-reads it, and returns
  *   the re-read rows — so the oracle checking it against the ORIGINAL
  *   table proves the round trip lost nothing.
  * K2 print sink — `df.show()` / streaming `format("console")` (used by
  *   StreamingOps; debug only).
  * K3 blackhole — `format("noop")` (Bench times every query through it).
  * K4 idempotent foreachBatch sink — streaming; see
  *   [[graft.streaming.StreamingOps.foreachBatchParquetSink]].
  */
object Sinks {

  val sinkDir = "/root/repo/target/sink/file_sink_data"

  /** K1: parquet write → re-read round trip. Write is partitioned (no
    * coalesce) — at scale this is N writer tasks; the determinism sort
    * happens after the re-read. */
  def fileSink(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(sinkDir)
    spark.read.parquet(sinkDir).orderBy("o_orderkey")
  }
}
