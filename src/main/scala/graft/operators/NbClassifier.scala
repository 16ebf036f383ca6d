package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Naive-Bayes quality classifier (SURVEY.md §2.7 [EXT] — the
  * DISCRIMINATIVE member of the model-based filter family; the
  * likelihood member is [[LmScore]]). Production pipelines run a linear
  * text classifier (fastText in GPT-3/LLaMA-style curation) to score
  * "does this look like the curated reference class"; multinomial NB
  * log-odds is that linear model trained by pure counting — which makes
  * it exactly recomputable by the DuckDB oracle, unlike an SGD-trained
  * model.
  *
  * Training (weak supervision, the standard bootstrap): the positive /
  * negative classes are the heuristic quality gate's keep / drop slices
  * ([[TextOps.quality]]). Per token, with add-one smoothing over the
  * top-[[LmScore.VocabK]] union vocabulary:
  *
  *   lodds(t) = micro(log10 (c⁺(t)+1)/(N⁺+V+1)) −
  *              micro(log10 (c⁻(t)+1)/(N⁻+V+1))
  *
  * quantized to integer micro-log10 units PER CLASS TERM (the
  * [[LmScore]] exactness contract: integer summation makes the oracle's
  * row-sum bit-equal to the kernel's array fold). OOV tokens get the
  * smoothing floors. A document's score is the mean per-token log-odds —
  * positive ⇒ more reference-like than junk-like.
  *
  * Scoring reuses the [[graft.plans.UnigramScoreExpr]] kernel verbatim
  * (token → micro map + OOV constant + fold — the kernel is
  * model-agnostic), so the scale shape is identical: one narrow
  * codegen'd projection, O(1)/token, driver-resident model. Training is
  * two token-count aggregations (one corpus pass computes both — the
  * label is a column, not a split) + an O(V) rank.
  */
object NbClassifier {

  private def microLp(p: Column): Column =
    round(log10(p) * LmScore.Micro, 0).cast("long")

  /** Train the log-odds model from any frame with `text` and a boolean
    * `pos` column. Returns a ONE-ROW frame (`model` map token →
    * micro-log-odds, `oov` long) — [[LmScore.collectModel]]-compatible. */
  def trainLogOdds(labeled: DataFrame, vocabK: Int = LmScore.VocabK): DataFrame = {
    // ONE tokenize pass counts both classes: explode, then conditional
    // sums per token. Persisted: the counts frame feeds the vocab rank,
    // the class totals, and the model projection (the LmScore.trainModel
    // discipline — released by the harness's per-key clearCache).
    val cnt = labeled
      .select(col("pos"), explode(split(col("text"), " ")).as("t"))
      .groupBy("t").agg(
        sum(when(col("pos"), 1L).otherwise(0L)).as("cp"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("cn"))
      .persist()
    val ranked = cnt.withColumn("rk",
      row_number().over(Window.partitionBy(pmod(length(col("t")), lit(1)))
        .orderBy((col("cp") + col("cn")).desc, col("t"))))
    val model = ranked.filter(col("rk") <= vocabK).select("t", "cp", "cn")
    val stats = cnt.agg(sum("cp").as("np"), sum("cn").as("nn"))
      .crossJoin(model.agg(count(lit(1)).as("v")))
    model.crossJoin(broadcast(stats))
      .select(col("t"),
        (microLp((col("cp") + 1).cast("double")
            / (col("np") + col("v") + 1).cast("double"))
          - microLp((col("cn") + 1).cast("double")
            / (col("nn") + col("v") + 1).cast("double"))).as("lp"),
        col("np"), col("nn"), col("v"))
      .groupBy("np", "nn", "v")
      .agg(map_from_entries(collect_list(struct(col("t"), col("lp"))))
        .as("model"))
      .select(col("model"),
        (microLp(lit(1.0) / (col("np") + col("v") + 1).cast("double"))
          - microLp(lit(1.0) / (col("nn") + col("v") + 1).cast("double")))
          .as("oov"))
  }

  /** Declared key (`nb_score`): weak labels from the heuristic gate, one
    * training pass, kernel scoring of the whole corpus. `odds_mean` > 0
    * reads "more like the keep class than the drop class". */
  def nbScore(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val labeled = TextOps.quality(docs.select("doc_id", "text"))
      .select(col("text"), (col("verdict") === "keep").as("pos"))
    val (model, oov) = LmScore.collectModel(trainLogOdds(labeled))
    LmScore.scoreKernel(docs.select("doc_id", "lang", "text"), model, oov)
      .withColumnRenamed("lp_mean", "odds_mean")
      .select("doc_id", "lang", "n_tok", "odds_mean")
      .orderBy("doc_id")
  }
}
