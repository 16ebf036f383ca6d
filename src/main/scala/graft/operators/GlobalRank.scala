package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT global rank + the CCNet percentile cut (SURVEY.md
  * §2.7 [EXT]). CCNet (Wenzek et al. 2020 §4.3) doesn't threshold the LM
  * score at a constant — it sorts the corpus by perplexity and splits it
  * into head/middle/tail TERCILES, keeping the head (and often middle)
  * for training. That needs every document's exact global rank, and the
  * naive form — `row_number() over (order by score)` — is a
  * SinglePartition sort of the corpus: the one plan shape this engine
  * bans everywhere.
  *
  * [[rankByScore]] is the two-phase prefix-sum discipline
  * ([[Packing]]/[[DomainMix]]) applied to ranking: quantize the score
  * into ORDERED coarse buckets (bounded by the score's numeric range —
  * a few hundred — never by corpus size), count per bucket with map-side
  * partials, cumulate the ≤few-hundred bucket counts in a tiny window,
  * broadcast the offsets back, and rank within buckets in parallel.
  * rank = bucket offset + within-bucket row_number, exactly the global
  * `row_number() over (order by score desc, id)` — the oracle computes
  * that naive form and must hash-match, so a lost or double-counted
  * bucket turns rows red.
  *
  * Exactness: the scores are [[LmScore]] means (6-dp-rounded doubles both
  * engines produce bit-identically — the lm_score contract), bucket =
  * `floor(score × BucketScale)` is one IEEE multiply + floor, and the
  * (score desc, doc_id) order compares identical doubles — no float
  * flake anywhere.
  */
object GlobalRank {

  /** Bucket granularity for the score quantization: 0.01 score units per
    * bucket over lp_mean's ≈ [-7, 0] range → ≤ ~700 ordered buckets. */
  val BucketScale = 100

  /** Exact global rank of every row by (`score` DESC, `idCol` ASC),
    * without a corpus-wide single-partition sort. Appends `rank`.
    * `materialize = false` returns the LAZY two-phase plan and leaves the
    * scored frame cached for the caller to release — the plan-audit hook. */
  def rankByScore(df: DataFrame, score: Column, idCol: Column,
      materialize: Boolean = true): DataFrame = {
    // Cache contract ([[graft.Caching]]): both phases read the scored
    // frame — without the persist the score expression (for
    // `ccnet_buckets`, the LM kernel over the full corpus) evaluates
    // twice. The cache is released INSIDE the operator (below) after the
    // ranked result is materialized, so composed pipelines and long-lived
    // sessions don't accumulate stale cached assignments across calls.
    val bucketed = df
      .withColumn("_s", score)
      .withColumn("_b", floor(score * BucketScale).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // phase B: per-bucket counts (map-side combined) → DESC cumulative
    // offsets over the bounded bucket frame (pmod keeps WindowExec's
    // no-partition warning quiet — the Ranking/Packing trick; the window
    // input is ≤ ~hundreds of rows by construction)
    val wOff = Window.partitionBy(pmod(col("_b"), lit(1)))
      .orderBy(col("_b").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = bucketed.groupBy("_b").agg(count(lit(1)).as("_bn"))
      .withColumn("_boff", sum("_bn").over(wOff) - col("_bn"))
      .select("_b", "_boff")
    // phase A: within-bucket ranks in parallel across buckets
    val wIn = Window.partitionBy("_b").orderBy(col("_s").desc, idCol)
    val ranked = bucketed
      .withColumn("_rn", row_number().over(wIn))
      .join(broadcast(offsets), "_b")
      .withColumn("rank", col("_boff") + col("_rn"))
      .drop("_s", "_b", "_rn", "_boff")
    // materialize (the ranked frame is df + one long — callers pass narrow
    // scored frames here, never raw text) and release the phase cache so
    // repeated calls in one session don't leak cached score frames
    if (!materialize) ranked
    else {
      val out = ranked.localCheckpoint(true)
      bucketed.unpersist(blocking = false)
      out
    }
  }

  /** Declared key (`ccnet_buckets`): score the corpus with the en-slice
    * unigram LM ([[LmScore]]), rank by score desc (head = most
    * reference-like = lowest perplexity), and cut into CCNet's
    * head/middle/tail terciles by exact rank. The corpus size joins in as
    * a 1-row broadcast (the bm25 corpus-stats shape). */
  def ccnetBuckets(spark: SparkSession, dir: String,
      materialize: Boolean = true): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val (model, oov) = LmScore.collectModel(
      LmScore.trainModel(docs.filter(col("lang") === "en")))
    val scored = LmScore.scoreKernel(docs.select("doc_id", "lang", "text"), model, oov)
      .select("doc_id", "lang", "lp_mean")
    val ranked = rankByScore(scored, col("lp_mean"), col("doc_id"), materialize)
    val n = ranked.agg(count(lit(1)).as("_n"))
    ranked.crossJoin(broadcast(n))
      .withColumn("bucket",
        when(col("rank") * 3 <= col("_n"), "head")
          .when(col("rank") * 3 <= col("_n") * 2, "middle")
          .otherwise("tail"))
      .select("doc_id", "lang", "lp_mean", "rank", "bucket")
      .orderBy("doc_id")
  }
}
