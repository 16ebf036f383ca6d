package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark decontamination (SURVEY.md §2.7 [EXT]): flag training
  * documents whose token n-grams are substantially CONTAINED in an
  * eval/benchmark document — the asymmetric overlap that matters for
  * test-set leakage (a training doc quoting a benchmark item scores high
  * containment even when Jaccard is diluted by surrounding text).
  *
  * Scale shape: the benchmark side is small by nature (eval suites are
  * thousands of items, not billions), so its exploded shingle postings
  * BROADCAST; the corpus side is one narrow shingle projection + explode,
  * a broadcast-hash join on the shingle, and a hash aggregation on the
  * (doc, bench) pair — no wide join, no all-pairs, and the corpus is
  * touched exactly once. The same pipeline at 100 TB is the standard
  * decontamination pass over a crawl.
  */
object Contamination {

  /** Token-shingle width, containment threshold, and the benchmark id
    * boundary for the declared key (docs with doc_id < BenchMaxId stand in
    * for the eval set). Interpolated into the oracle SQL — single source
    * of truth. */
  val ShingleN = 5
  val Tau = 0.5
  val BenchMaxId = 50L

  /** Built-in-function formulation of [[graft.plans.TokenNgramsExpr]] over
    * an ALREADY-TOKENIZED column. Callers must materialize the token array
    * in its own projection first (the [[TextOps.langIdScoreOfToks]]
    * discipline): the lambda body is re-evaluated per element with no CSE,
    * so an inlined `split` would re-tokenize the text once per shingle
    * POSITION. Guarded: texts shorter than `n` tokens yield an empty array
    * (a bare `sequence(0, size-n)` would DESCEND for negative ends —
    * Spark sequences run backwards when start > stop); NULL stays NULL to
    * match the kernel. Bit-equality with the kernel is asserted in
    * VectorExprSpec. */
  def tokenShinglesOfToks(toks: Column, n: Int = ShingleN): Column =
    when(toks.isNull, lit(null).cast("array<string>"))
      .when(size(toks) >= n,
        array_distinct(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(typedLit(Array.empty[String]))

  /** Convenience form over raw text — fine for one-off expressions; inside
    * plans prefer materializing the tokens and [[tokenShinglesOfToks]]. */
  def tokenShingles(text: Column, n: Int = ShingleN): Column =
    tokenShinglesOfToks(split(text, " "), n)

  /** (doc_id, sh) with sh = distinct token n-grams: the codegen'd
    * [[graft.plans.TokenNgramsExpr]] kernel when the session has
    * GraftExtensions (one char-scan per row, index-arithmetic substrings
    * — measured ~3× the whole key's cost cheaper than the interpreted
    * lambda at sf0.1), the two-projection HOF form otherwise (same
    * catalog-fallback contract as Similarity.simhashFor). */
  private def shingled(docs: DataFrame, n: Int): DataFrame =
    if (docs.sparkSession.catalog.functionExists("graft_token_ngrams"))
      docs.select(col("doc_id"),
        call_function("graft_token_ngrams", col("text"), lit(n)).as("sh"))
    else
      docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), tokenShinglesOfToks(col("toks"), n).as("sh"))

  /** Containment of each corpus document in each benchmark document:
    * |shingles(doc) ∩ shingles(bench)| / |shingles(doc)|, kept when
    * ≥ `tau`. Exact integer-division containment — bit-identical across
    * engines. Returns (doc_id, bench_id, n_common, containment). */
  def contained(corpus: DataFrame, bench: DataFrame, n: Int = ShingleN,
      tau: Double = Tau): DataFrame = {
    val corpusSh = shingled(corpus, n).filter(size(col("sh")) > 0)
    val benchPost = shingled(bench, n)
      .select(col("doc_id").as("bench_id"), explode(col("sh")).as("sh"))
    corpusSh
      .select(col("doc_id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("sh"))
      .join(broadcast(benchPost), "sh")
      .groupBy("doc_id", "bench_id", "n_sh")
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common").cast("double") / col("n_sh") >= tau)
      .select(col("doc_id"), col("bench_id"), col("n_common"),
        (col("n_common").cast("double") / col("n_sh")).as("containment"))
  }

  /** Declared key (`contamination`): the corpus = docs with
    * doc_id ≥ [[BenchMaxId]], benchmark = docs below it. The DuckDB oracle
    * recomputes shingling, the intersection count, and the threshold, so a
    * regression anywhere in the pipeline turns rows red. */
  def contamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    contained(
      docs.filter(col("doc_id") >= BenchMaxId),
      docs.filter(col("doc_id") < BenchMaxId))
      .orderBy("doc_id", "bench_id")
  }
}
