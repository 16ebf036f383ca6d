package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The curation macro in the incremental arrival mode (SURVEY.md §2.7
  * E10 composed with E14 — what an accumulating 100 TB corpus actually
  * runs nightly): each arriving batch goes quality-gate → dedup against
  * the batch AND the persisted fingerprint index → train split →
  * sequence packing whose global token offsets CONTINUE exactly where
  * the previous run ended, so the packed corpus reads as one unbroken
  * doc_id-ordered concatenation across arbitrarily many runs — a
  * training job consuming sequences never sees a seam.
  *
  * Persistent state between runs is tiny and narrow:
  *   - `fps/`:    accepted documents' 32 B fingerprints
  *     ([[IncrementalDedup]]'s bucket-partitioned layout, verbatim) —
  *     appended per step with ALL accepted survivors (both shards: a
  *     val-shard doc must still suppress future duplicates);
  *   - `cursor/`: ONE row — the global token offset the next run's
  *     packing starts from (the train shard's running total).
  *
  * Per-step cost is O(batch) text work + one narrow anti-join against
  * the index — the accumulated corpus's TEXT is never touched again,
  * which is the whole point vs re-running [[Curation.curate]] over
  * accumulation ∪ batch (O(total) text per night, growing forever).
  */
object CurationIncremental {

  /** gate → in-batch keep-first → anti-join vs `idxFps` — the accepted
    * survivors of one batch as the narrow (doc_id, quality, fp, n_tok)
    * frame every downstream stage consumes ([[Curation.curate]] stages
    * 1-2 with the cross-index arm; the text never passes this point). */
  def accepted(batch: DataFrame, idxFps: DataFrame): DataFrame = {
    val w = Window.partitionBy("fp").orderBy("doc_id")
    TextOps.quality(batch)
      .filter(col("verdict") === "keep")
      .select(col("doc_id"), col("quality"),
        TextOps.fingerprint(col("text")).as("fp"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
      .join(idxFps.select("fp"), Seq("fp"), "left_anti")
  }

  /** Stage 3-4 over one batch's accepted survivors: train shard, then
    * pack CONTINUING from `offset` (the cursor the previous run left). */
  def packBatch(acc: DataFrame, offset: Long,
      budget: Int = Packing.SeqBudget,
      bucketWidth: Long = Packing.BucketWidth): DataFrame =
    Packing.packSequences(
        acc.filter(Sampling.hashBucket(col("doc_id")) < Sampling.TrainUpper)
          .select("doc_id", "quality", "n_tok"),
        "doc_id", "n_tok", budget, bucketWidth, offset)
      .select("doc_id", "quality", "n_tok", "start_tok", "seq_id")

  // ---------------------------------------------------- persisted state

  /** One nightly step against the state at `path`: returns the batch's
    * packed train rows (offsets continuing the cursor), appends accepted
    * fingerprints, advances the cursor. `init = true` starts fresh state
    * (empty index, cursor 0) — the first night.
    *
    * Both outputs are eagerly `localCheckpoint`ed BEFORE the state
    * writes ([[IncrementalDedup.step]]'s guard): the fp append
    * invalidates plans scanning the index path, and the cursor overwrite
    * would feed a lazy re-evaluation the NEXT run's offset. */
  def step(spark: SparkSession, batch: DataFrame, path: String,
      budget: Int = Packing.SeqBudget,
      bucketWidth: Long = Packing.BucketWidth,
      init: Boolean = false): DataFrame = {
    import spark.implicits._
    val (idxFps, cursor) =
      if (init) (Seq.empty[String].toDF("fp"), 0L)
      else (IncrementalDedup.readFpIndex(spark, s"$path/fps").select("fp"),
        spark.read.parquet(s"$path/cursor").head().getLong(0))
    val acc = accepted(batch, idxFps).localCheckpoint(true)
    val out = packBatch(acc, cursor, budget, bucketWidth).localCheckpoint(true)
    IncrementalDedup.writeFpIndex(acc.select("fp"), s"$path/fps",
      append = !init)
    val total = out.agg(coalesce(sum("n_tok"), lit(0L))).head().getLong(0)
    Seq(cursor + total).toDF("next_tok")
      .write.mode("overwrite").parquet(s"$path/cursor")
    out
  }

  /** Declared key (`curation_incremental`): the two-batch fixture that
    * proves the seam is invisible — EVEN documents arrive as night 1
    * (fresh state), ODD documents as night 2 (dedup against night 1's
    * accepted fingerprints; packing continues at night 1's train-token
    * total). Output: both nights' packed rows stamped with their batch,
    * ordered by the global offset — the DuckDB oracle recomputes both
    * nights as chained CTEs, so a regression in any stage, in the
    * cross-index dedup arm, or in the offset hand-off (the first odd
    * start_tok must equal the even train total EXACTLY) turns rows red.
    * Frames-as-index like the sibling incremental keys; the persisted
    * [[step]] is spec- and probe-covered. */
  def curationIncremental(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val acc1 = accepted(docs.filter(col("doc_id") % 2 === 0),
        Seq.empty[String].toDF("fp"))
      .localCheckpoint(true)
    val out1 = packBatch(acc1, 0L)
    // the cursor hand-off: night 2 starts at night 1's train-token total
    // (a 1-row aggregate collect — the bounded-frame discipline)
    val tot1 = out1.agg(coalesce(sum("n_tok"), lit(0L))).head().getLong(0)
    val out2 = packBatch(
      accepted(docs.filter(col("doc_id") % 2 === 1), acc1.select("fp")), tot1)
    out1.withColumn("batch", lit(1))
      .union(out2.withColumn("batch", lit(2)))
      .select("batch", "doc_id", "quality", "n_tok", "start_tok", "seq_id")
      .orderBy("start_tok")
  }
}
