package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end curation macro (SURVEY.md §2.7 [EXT] — the north-star
  * pipeline as ONE composed plan): quality-filter → exact dedup → train
  * split → sequence packing, documents in, training sequences out.
  *
  * The point being proven is COMPOSITION WITHOUT MATERIALIZATION: every
  * stage is the same public operator the singleton keys run
  * ([[TextOps.quality]], [[TextOps.fingerprint]] + keep-first,
  * [[Sampling.hashBucket]], [[Packing.packSequences]]), chained as plain
  * DataFrame transforms, and Catalyst plans the whole thing as one query —
  * the quality score, fingerprint, and split bucket all compute in the
  * SAME narrow projection over one text scan, the dedup window is the one
  * corpus-wide shuffle before packing's bucketed phases, and nothing hits
  * disk between stages. At 100 TB that is the difference between one pass
  * over the corpus and four (a per-stage materializing pipeline reads and
  * writes the full text four times; this reads it once — the dedup
  * exchange ships only (fp, doc_id, n_tok, quality), never the text).
  *
  * Stage semantics (each individually oracle-gated by its own key; the
  * composed DuckDB CTE oracle gates their interaction here):
  *   1. keep docs with quality ≥ 0.35 ([[TextOps.quality]]'s verdict);
  *   2. keep the lowest doc_id per bag-of-words fingerprint;
  *   3. keep the ~80 % train shard of the deterministic md5 split;
  *   4. pack survivors into [[Packing.SeqBudget]]-token sequences via the
  *      two-phase distributed prefix sum (no SinglePartition doc pass).
  */
object Curation {

  /** The composed pipeline over ANY (doc_id, text) frame — the library
    * surface ([[curationPipeline]] is its declared-key binding; the scale
    * probe `graft.Probe curation` runs it over a synthetic 1M-doc corpus
    * with planted junk and duplicates). */
  def curate(docs: DataFrame, budget: Int = Packing.SeqBudget,
      bucketWidth: Long = Packing.BucketWidth,
      redactPii: Boolean = false,
      mixBudgets: Option[Seq[(String, Long)]] = None,
      domainCol: String = "lang",
      lmFilter: Option[(Map[String, Long], Long, Double)] = None,
      dsirFilter: Option[(Map[String, Long], Long)] = None,
      tokenCounter: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        t => size(split(t, " ")).cast("long")): DataFrame = {
    // 0. optional PII scrub (r12): [[Redact.clean]] is a stateless column
    //    expression, so it fuses into the SAME narrow projection as the
    //    quality score — everything downstream (quality, fingerprint,
    //    token counts) sees the scrubbed text, which is the point: a
    //    redacted duplicate must dedup against a redacted original
    val input =
      if (redactPii) docs.withColumn("text", Redact.clean(col("text")))
      else docs
    // 1. quality gate — narrow, same columns the text_quality key emits
    val gated = TextOps.quality(input).filter(col("verdict") === "keep")
    // 1b. optional CCNet LM filter (r12): keep docs whose mean log10
    //     token probability under a reference model clears the cutoff
    //     ([[LmScore.scoreKernel]] — a narrow codegen'd projection, so
    //     like the heuristic gate it fuses into the same stage; the
    //     (model, oov) pair is driver-resident, trained out-of-band via
    //     [[LmScore.trainModel]]/[[LmScore.collectModel]]). Runs on the
    //     scrubbed text, BEFORE dedup — the CCNet stage order
    val lmKept = lmFilter match {
      case Some((model, oov, cutoff)) =>
        LmScore.scoreKernel(gated, model, oov)
          .filter(col("lp_mean") >= cutoff)
          .drop("n_tok", "lp_mean")
      case None => gated
    }
    // 1c. optional DSIR importance selection (r12): keep docs whose hashed
    //     n-gram features are likelier under the target model than the raw
    //     model ([[Dsir.score]] — like the LM filter, a narrow kernel
    //     projection over a driver-resident model, so it fuses into the
    //     same stage; weights train out-of-band via [[Dsir.trainWeights]]).
    //     Paper placement: selection runs on the cleaned, quality-gated
    //     crawl BEFORE dedup (Xie et al. 2023 §3)
    val kept = dsirFilter match {
      case Some((weights, oov)) =>
        Dsir.score(lmKept, weights, oov)
          .filter(col("selected"))
          .drop("n_feat", "lw_mean", "selected")
      case None => lmKept
    }
    // 2. exact dedup — keep-first per fingerprint (the doc_dedup shape);
    //    n_tok is computed HERE so the dedup exchange and everything after
    //    it carry four narrow columns, not the text (plus the domain
    //    column when a mix stage needs it downstream). `tokenCounter`
    //    decides what a "token" is for EVERY downstream budget — the
    //    domain-mix fills and the sequence packing both consume this one
    //    column, so swapping in [[Bpe.encodeSymCount]] (tokenizer-aware
    //    curation — the counts a training-batch writer uses) re-budgets
    //    the whole pipeline without touching any stage.
    val w = Window.partitionBy("fp").orderBy("doc_id")
    val narrowCols = Seq(col("doc_id"), col("quality"),
      TextOps.fingerprint(col("text")).as("fp"),
      tokenCounter(col("text")).as("n_tok")) ++
      (if (mixBudgets.isDefined) Seq(col(domainCol)) else Nil)
    val deduped = kept
      .select(narrowCols: _*)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    // 3. deterministic train shard (the split_hash discipline)
    val sharded = deduped
      .filter(Sampling.hashBucket(col("doc_id")) < Sampling.TrainUpper)
    // 3b. optional weighted domain mixing (r12): fill each domain's token
    //     budget in [[DomainMix]] hash order — placed AFTER dedup/split so
    //     budgets are filled with unique training-shard tokens only
    val train = mixBudgets match {
      case Some(budgets) =>
        DomainMix.mix(sharded, domainCol, "n_tok", budgets)
          .select("doc_id", "quality", "n_tok")
      case None => sharded.select("doc_id", "quality", "n_tok")
    }
    // 4. pack into training sequences
    Packing.packSequences(train, "doc_id", "n_tok", budget, bucketWidth)
      .select("doc_id", "quality", "n_tok", "start_tok", "seq_id")
  }

  /** Declared key (`curation_pipeline`): one row per surviving document —
    * its quality score, token count, and packed-sequence coordinates. */
  def curationPipeline(spark: SparkSession, dir: String): DataFrame =
    curate(Tables.documents(spark, dir).select("doc_id", "text"))
      .orderBy("doc_id")

  /** Declared key (`curation_full`): the macro with EVERY optional stage
    * live — [[Redact.plantPii]] seeds the synthetic PII fixture (the
    * corpus carries none), then redact → quality → dedup → split →
    * domain-mix ([[DomainMix.Budgets]]) → pack runs as ONE plan. The
    * oracle chains all six stage recomputations as CTEs, so a regression
    * in any stage OR in how the stages hand off (redacted text must feed
    * the quality score, the fingerprint, and the token counts; the mix
    * must select over post-split survivors only) turns rows red. */
  def curationFull(spark: SparkSession, dir: String): DataFrame =
    curate(
      Redact.plantPii(Tables.documents(spark, dir)
        .select("doc_id", "text", "lang")),
      redactPii = true,
      mixBudgets = Some(DomainMix.Budgets), domainCol = "lang")
      .orderBy("doc_id")
}
