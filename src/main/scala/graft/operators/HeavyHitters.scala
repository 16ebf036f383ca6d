package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** Misra-Gries heavy hitters — the frequent-items member of the sketch
  * family (SURVEY.md §2.4 [EXT]; HLL covers distinct counts, GK covers
  * quantiles, this covers "which keys dominate"). The curation uses are
  * everywhere: hot-domain detection in a crawl, boilerplate-URL and
  * vocabulary trimming, finding the skewed keys that need salting —
  * all cases where the EXACT answer (a full groupBy over every key) costs
  * a corpus-wide shuffle the summary avoids.
  *
  * Algorithm (Misra & Gries 1982; mergeability per Agarwal et al., "
  * Mergeable Summaries", PODS 2012): keep at most k−1 (key, count)
  * counters; an unmatched arrival with no free counter decrements ALL
  * counters (dropping zeros) instead of being stored. Merging two
  * summaries sums matching counters, then subtracts the k-th largest
  * count from every counter and drops non-positives — the same "pay one
  * decrement per evicted unit" argument bounds the combined error.
  *
  * Guarantees (deterministic, INDEPENDENT of arrival/merge order, over a
  * stream of n items):
  *  - estimate(x) ∈ [count(x) − n/k, count(x)] for EVERY key x
  *    (absent keys estimate 0);
  *  - every key with count(x) > n/k survives in the summary.
  * The POINT estimates do depend on order (which counters got
  * decremented), so the summary is spec-verified against its bounds
  * rather than oracle-hashed — the `approx_distinct` adjudication applied
  * to a summary whose variability is inherent, not a defect.
  *
  * Scale shape: the Aggregator's partial (map-side) phase compresses each
  * partition to ≤ k−1 counters BEFORE the shuffle — the exchange carries
  * O(#partitions × k) rows regardless of input size, the same bounded-
  * state argument as [[TopKPerKey]]. State is a small Seq; the linear
  * per-element scan is the textbook form (a production hot loop would use
  * a hash map inside a custom ImperativeAggregate, same semantics).
  */
object HeavyHitters {

  case class MGEntry(key: String, n: Long)
  case class MGBuf(entries: Seq[MGEntry], processed: Long)

  class MisraGries(k: Int) extends Aggregator[String, MGBuf, MGBuf] {
    require(k >= 2, "Misra-Gries needs at least 2 counters")

    override def zero: MGBuf = MGBuf(Nil, 0L)

    override def reduce(b: MGBuf, x: String): MGBuf = {
      val i = b.entries.indexWhere(_.key == x)
      val next =
        if (i >= 0) b.entries.updated(i, MGEntry(x, b.entries(i).n + 1))
        else if (b.entries.length < k - 1) MGEntry(x, 1L) +: b.entries
        else b.entries.map(e => e.copy(n = e.n - 1)).filter(_.n > 0)
      MGBuf(next, b.processed + 1)
    }

    override def merge(b1: MGBuf, b2: MGBuf): MGBuf = {
      val summed = (b1.entries ++ b2.entries)
        .groupBy(_.key).view
        .map { case (key, es) => MGEntry(key, es.map(_.n).sum) }
        .toSeq
      val trimmed =
        if (summed.length <= k - 1) summed
        else {
          // subtract the k-th largest count from all, drop non-positive —
          // at most k−1 counters survive (Agarwal et al. 2012, §3.1)
          val kth = summed.map(_.n).sorted(Ordering[Long].reverse)(k - 1)
          summed.map(e => e.copy(n = e.n - kth)).filter(_.n > 0)
        }
      MGBuf(trimmed, b1.processed + b2.processed)
    }

    override def finish(r: MGBuf): MGBuf = r
    override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
    override def outputEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
  }

  /** One global summary over a string column: returns
    * (key, est, processed) rows for the surviving counters, estimate
    * descending. For per-group summaries, use `udaf(new MisraGries(k))`
    * under a `groupBy` directly. */
  def heavyHitters(values: Dataset[String], k: Int): DataFrame = {
    val spark = values.sparkSession
    import spark.implicits._
    val agg = udaf(new MisraGries(k))
    values.toDF("v")
      .agg(agg(col("v")).as("mg"))
      .select(explode(col("mg.entries")).as("e"), col("mg.processed").as("processed"))
      .select(col("e.key").as("key"), col("e.n").as("est"), col("processed"))
      .orderBy(col("est").desc, col("key"))
  }

  /** k values for the declared key — both below the stream's 5 distinct
    * langs, so the decrement/eviction path genuinely runs. Shared with the
    * oracle SQL via interpolation in SparkEntry. */
  val CheckedKs: Seq[Int] = Seq(3, 4)

  /** Declared `heavy_hitters` form — oracle-able by the `approx_distinct`
    * adjudication: the summary's point estimates are order-dependent, but
    * the two MG GUARANTEES are not, so the key emits one row per
    * (k, guaranteed-heavy key) — every `documents.lang` whose exact count
    * exceeds n/k — with the exact count (DuckDB-recomputable) and booleans
    * certifying (a) the key survived in the summary and (b) its estimate
    * sits in [count − n/k, count]. The oracle emits literal TRUE; a broken
    * eviction or merge turns the row red. All comparisons are integer
    * (cnt·k > n, k·(cnt − est) ≤ n) — no float fuzz across engines.
    *
    * This plan reads the corpus twice (exact counts + summary) — that is
    * the verification harness; production uses [[heavyHitters]] alone: one
    * pass, map-side state ≤ k−1 counters, shuffle O(#partitions × k). */
  def heavyHittersChecked(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val langs = Tables.documents(spark, dir).select(col("lang")).as[String]
    val exact = langs.toDF("key")
      .groupBy("key").agg(count(lit(1)).as("exact_cnt"))
    val total = exact.agg(sum("exact_cnt").as("n"))
    val perK = CheckedKs.map { k =>
      val summary = heavyHitters(langs, k).select(col("key"), col("est"))
      exact
        .crossJoin(broadcast(total))
        .filter(col("exact_cnt") * k > col("n")) // guaranteed survivors
        .join(broadcast(summary), Seq("key"), "left")
        .select(
          lit(k).as("k"), col("key"), col("exact_cnt"), col("n"),
          col("est").isNotNull.as("survived_ok"),
          (col("est").isNotNull && col("est") <= col("exact_cnt") &&
            lit(k) * (col("exact_cnt") - col("est")) <= col("n"))
            .as("bound_ok"))
    }
    perK.reduce(_ unionAll _).orderBy("k", "key")
  }
}
