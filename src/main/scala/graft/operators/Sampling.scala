package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines
  * (SURVEY.md §2.7 [EXT]): hash-based train/val/test assignment and exact
  * per-stratum subsampling.
  *
  * Both operators key every decision off `md5(doc_id)` rather than an RNG:
  * the assignment is a pure narrow projection — reproducible across runs,
  * engines, partitionings and cluster sizes, and stable under corpus
  * growth (a document's split never changes when more data arrives, the
  * property that keeps eval sets uncontaminated across crawl refreshes).
  * That is the standard production split discipline, and it is what makes
  * the DuckDB oracle able to recompute the exact same assignment.
  */
object Sampling {

  /** Split-fraction boundaries, expressed as the first two hex characters
    * of the row's md5 bucket (256 buckets; string compare = ASCII order on
    * both engines). `< TrainUpper` ≈ 205/256 ≈ 80 %, `< ValUpper` ≈ 25/256
    * ≈ 10 %, remainder ≈ 10 %. Interpolated into the oracle SQL — single
    * source of truth. */
  val TrainUpper = "cd"
  val ValUpper = "e6"

  /** The md5 hex bucket for a key column (any type — cast through string;
    * UTF-8 bytes are what both engines hash). */
  def hashBucket(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    substring(md5(key.cast("string")), 1, 2)

  /** Declared key (`split_hash`): deterministic train/val/test assignment
    * over the documents table. Narrow codegen'd projection — zero
    * shuffles, embarrassingly parallel, the per-row cost is one md5 over
    * a short string; identical plan at sf0.01 and 100 TB. */
  def splitHash(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), hashBucket(col("doc_id")).as("bucket"))
      .withColumn("split",
        when(col("bucket") < TrainUpper, "train")
          .when(col("bucket") < ValUpper, "val")
          .otherwise("test"))
      .orderBy("doc_id")

  /** Per-stratum sample size for the declared key. */
  val StratumN = 20

  /** Salt so the stratified sample draws an order independent of
    * [[splitHash]]'s buckets (same doc_id, different md5 input). */
  val StratSalt = ":strat"

  /** Declared key (`sample_stratified`): exactly `StratumN` documents per
    * language, drawn in md5 order — a deterministic stratified sample
    * (equal representation per stratum regardless of the corpus's language
    * skew, the usual shape for eval-set construction). One hash-shuffle on
    * the stratum key + a per-stratum top-n window; at 100 TB the window is
    * the bounded-heap per-key top-k shape ([[TopKPerKey]]) — per-stratum
    * state is O(n), never a full sort of the corpus. */
  def sampleStratified(spark: SparkSession, dir: String, n: Int = StratumN): DataFrame = {
    val w = Window.partitionBy("lang").orderBy("skey", "doc_id")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        md5(concat(col("doc_id").cast("string"), lit(StratSalt))).as("skey"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
      .select("lang", "rn", "doc_id", "skey")
      .orderBy("lang", "rn")
  }
}
