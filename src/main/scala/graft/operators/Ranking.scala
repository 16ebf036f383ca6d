package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical relevance ranking for retrieval-style corpus queries
  * (SURVEY.md §2.7 [EXT]): Okapi BM25 over the documents table.
  *
  * The query term set is a small fixed list, so no token explode is
  * needed: per-document term frequencies are narrow `filter(toks, …)`
  * counts in one codegen'd projection, the corpus statistics (N, Σdl,
  * per-term document frequencies) collapse to ONE tiny row that broadcasts
  * back, and the final top-k is a TakeOrderedAndProject. At 100 TB that is
  * scan → 1-row aggregate → broadcast → scan-side scoring → top-k: no
  * wide shuffle anywhere.
  *
  * Determinism: avgdl is derived from an exact integer Σdl (not a double
  * `avg`), every score term is IEEE +,-,×,÷ in the same association order
  * the oracle SQL spells, and ranking uses the 6-dp-rounded score, so the
  * DuckDB oracle hash-matches. `ln` is the one transcendental; both
  * engines round it to the same double in practice and the 6-dp rounding
  * absorbs any ulp skew.
  */
object Ranking {

  val K1 = 1.2
  val B = 0.75

  /** Precomputed compound constants, interpolated into BOTH the Column
    * expression and the oracle SQL from these shared vals: each engine then
    * parses the identical printed literal. (Computing `K1 + 1` separately on
    * each side round-trips only because today's constants print as
    * shortest-repr decimals — a future constant whose sum doesn't round-trip
    * through toString would silently skew the oracle below the 6-dp
    * rounding.) */
  val K1plus1 = K1 + 1
  val OneMinusB = 1 - B

  /** Fixed query for the declared key — three corpus terms with distinct
    * document frequencies (so the idf weighting actually orders them). */
  val QueryTerms = Seq("spark", "window", "merge")

  /** BM25 idf: ln((N − df + ½) / (df + ½) + 1) — the "+1" (Lucene form)
    * keeps idf positive even for terms in more than half the corpus. */
  private def idf(n: Column, df: Column): Column =
    log((n - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0))

  /** One term's BM25 contribution, association order mirrored exactly by
    * the oracle SQL builder [[termScoreSql]]. */
  private def termScore(tf: Column, dl: Column, n: Column, df: Column,
      avgdl: Column): Column =
    idf(n, df) * (tf * lit(K1plus1)) /
      (tf + lit(K1) * (lit(OneMinusB) + lit(B) * (dl / avgdl)))

  /** The same contribution in DuckDB SQL, interpolating the same constants
    * — single source of truth with [[termScore]] (SparkEntry splices these
    * into the `bm25_topk` oracle). */
  def termScoreSql(t: String): String =
    s"ln((n - df_$t + 0.5) / (df_$t + 0.5) + 1.0) * (tf_$t * $K1plus1) / " +
      s"(tf_$t + $K1 * ($OneMinusB + $B * (dl / avgdl)))"

  /** Declared key (`bm25_topk`): top-k documents by BM25 for
    * [[QueryTerms]]. */
  def bm25Topk(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    // tokens materialized once; dl and each per-term tf reference the
    // array column rather than re-splitting the text per expression
    val toks = col("toks")
    val perDoc = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(
        col("doc_id") +: size(toks).as("dl") +:
          QueryTerms.map(t => size(filter(toks, x => x === t)).as(s"tf_$t")): _*)
    // one global row: N, exact integer Σdl, per-term document frequencies
    val stats = perDoc.agg(
      count(lit(1)).as("n"),
      sum(col("dl")).as("dlsum") +:
        QueryTerms.map(t =>
          sum((col(s"tf_$t") > 0).cast("long")).as(s"df_$t")): _*)
      .withColumn("avgdl", col("dlsum").cast("double") / col("n"))
    val score = QueryTerms.map(t =>
      termScore(col(s"tf_$t"), col("dl"), col("n"), col(s"df_$t"), col("avgdl")))
      .reduce(_ + _)
    val ranked = perDoc.crossJoin(broadcast(stats))
      .select(col("doc_id"), round(score, 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
    // rank over the k survivors only (tiny frame; the heavy ordering was
    // the distributed TakeOrderedAndProject above). The partitionBy is a
    // constant-valued expression — semantically the same single partition
    // an empty spec would use — purely to keep WindowExec's "No Partition
    // Defined" warning out of bench/driver logs, where it buried real
    // signals (the frame is k rows by construction, so one partition is
    // the point). pmod(doc_id, 1) rather than lit(1) because Catalyst
    // prunes FOLDABLE partition expressions and the warning returns.
    ranked.withColumn("rank",
        row_number().over(Window.partitionBy(pmod(col("doc_id"), lit(1)))
          .orderBy(col("score").desc, col("doc_id"))))
      .select("rank", "doc_id", "score")
      .orderBy("rank")
  }
}
