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

  // ------------------------------------- weighted sampling without replacement

  /** Per-stratum draw count and salt for the declared `sample_weighted`
    * key. Interpolated into the oracle SQL — single source of truth. */
  val WeightedN = 20
  val WeightedSalt = ":aes"

  /** Deterministic WEIGHTED sampling without replacement — the
    * Efraimidis-Spirakis A-ES scheme (2006, "Weighted random sampling with
    * a reservoir"): give each row the key u^(1/w) for a uniform u and keep
    * the k largest keys; the inclusion probabilities are then exactly the
    * sequential weighted draw without replacement. The engine's twist is
    * the same as every sampler here: u is not an RNG but a HASH —
    * `md5(doc_id || salt)` → a 4-hex-digit integer → u = (h+1)/65537 ∈
    * (0,1) — so the draw is reproducible across runs/engines/partitionings
    * and stable under corpus growth, and the DuckDB oracle can recompute
    * it. Ranking uses log10(u)/w (monotone in u^(1/w)), quantized to
    * integer micro-log10 units ([[LmScore.Micro]] — the engine-wide
    * exactness contract) with doc_id tie-break, so the order compare is
    * integer arithmetic on both engines: no float-ranking flake.
    *
    * The weight here is the document's token count — "sample by token
    * mass", the standard shape for building eval/inspection slices whose
    * token budget, not doc count, is the constraint.
    *
    * Scale: one narrow projection computes (u, key) per row; selection is
    * a per-stratum top-k window — the [[sampleStratified]] discipline
    * (bounded-heap shape, WindowGroupLimit partial before the exchange;
    * never a corpus sort). */
  def aesKeyMicro(u: org.apache.spark.sql.Column,
      w: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(log10(u) / w * LmScore.Micro, 0).cast("long")

  /** 4-hex-digit integer from the head of an md5 hex string, via explicit
    * digit-position arithmetic (`instr` on the hex alphabet) — the one
    * hex→int form both engines spell identically. */
  def hexHead4(h: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 4).map { i =>
      (instr(lit("0123456789abcdef"), substring(h, i + 1, 1)) - 1) *
        (1 << (4 * (3 - i)))
    }.reduce((a, b) => a + b)

  def sampleWeighted(spark: SparkSession, dir: String,
      n: Int = WeightedN): DataFrame = {
    val w = Window.partitionBy("lang").orderBy(col("key_micro").desc, col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        md5(concat(col("doc_id").cast("string"), lit(WeightedSalt))).as("h"))
      .withColumn("u", (hexHead4(col("h")) + 1).cast("double") / 65537.0d)
      .withColumn("key_micro", aesKeyMicro(col("u"), col("n_tok")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
      .select("lang", "rn", "doc_id", "n_tok", "key_micro")
      .orderBy("lang", "rn")
  }
}
