package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-key top-k without a per-key sort (scale path for the
  * `win_rank`-style pattern).
  *
  * `row_number() OVER (PARTITION BY k ORDER BY v)` + `rn <= n` sorts EVERY
  * key's entire group to keep n rows. This Aggregator keeps a bounded
  * min-heap of size n per key instead: map-side partial aggregation
  * shrinks each partition's contribution to ≤ n entries per key BEFORE the
  * shuffle, so the exchange carries O(#keys × n) instead of all rows, and
  * nothing is ever fully sorted. The classic heavy-hitters shape for
  * "top N products per category over 100 TB".
  *
  * Returned as `(key, array<struct<score, id>>)` sorted descending —
  * explode to rows as needed.
  */
object TopKPerKey {

  type Entry = (Double, Long) // (score, tie-break id)

  case class TopKBuf(entries: Seq[Entry])

  /** Bounded descending top-k: smallest element evicted first; ties broken
    * toward the smaller id (matching ORDER BY score DESC, id ASC). */
  class TopKAgg(k: Int) extends Aggregator[Entry, TopKBuf, TopKBuf] {
    private def below(a: Entry, b: Entry): Boolean = // a ranks below b
      a._1 < b._1 || (a._1 == b._1 && a._2 > b._2)
    private def insert(buf: Seq[Entry], e: Entry): Seq[Entry] = {
      val merged = (e +: buf).sortWith((x, y) => below(y, x)) // descending
      if (merged.length > k) merged.take(k) else merged
    }
    override def zero: TopKBuf = TopKBuf(Nil)
    override def reduce(b: TopKBuf, a: Entry): TopKBuf = TopKBuf(insert(b.entries, a))
    override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf =
      TopKBuf(b2.entries.foldLeft(b1.entries)(insert))
    override def finish(r: TopKBuf): TopKBuf = r
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  }

  /** Top-k orders per customer by price — same semantics as
    * [[Relational.winRank]]'s rn <= k rows (asserted in TopKPerKeySpec),
    * different physical shape: partial bounded heaps, no per-key sort. */
  def topOrdersPerCustomer(spark: org.apache.spark.sql.SparkSession, dir: String, k: Int = 3): DataFrame = {
    import spark.implicits._
    val agg = udaf(new TopKAgg(k))
    graft.Tables.orders(spark, dir)
      .groupBy("o_custkey")
      // tuple-typed Aggregator input flattens to its component columns
      .agg(agg(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_custkey"), posexplode(col("top.entries")))
      .select(col("o_custkey"), (col("pos") + 1).as("rn"),
        col("col._2").as("o_orderkey"), col("col._1").as("o_totalprice"))
      .orderBy("o_custkey", "rn")
  }
}
