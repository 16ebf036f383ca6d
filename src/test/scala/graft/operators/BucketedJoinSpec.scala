package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed co-located join: the LAYOUT must change the plan (PlanAuditSpec
  * pins that) and must NOT change the answer — pinned here against the
  * plain-parquet join, plus the one-file-per-bucket ingest invariant the
  * sort elision rests on. */
class BucketedJoinSpec extends SparkSpec {

  test("bucket_join result is row-equal to the plain-parquet join") {
    val got = BucketedJoin.bucketJoin(spark, sf0001).collect()
    val want = graft.Tables.lineitem(spark, sf0001)
      .join(graft.Tables.orders(spark, sf0001),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"))
      .orderBy("o_orderpriority").collect()
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) === w.getString(0))
      assert(g.getLong(1) === w.getLong(1))
      assert(g.getDouble(2) === w.getDouble(2), s"revenue for ${g.getString(0)}")
    }
  }

  test("ingest writes exactly one file per bucket (the sort-elision precondition)") {
    val name = BucketedJoin.ensureBucketed(spark, sf0001, "orders", "o_orderkey")
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new java.io.File(
      if (wh.getScheme == null) wh.getPath else new java.io.File(wh).getPath, name)
    val parts = Option(loc.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
    assert(parts.length === BucketedJoin.NumBuckets,
      s"${parts.length} part files for ${BucketedJoin.NumBuckets} buckets")
    // bucket ids 0..N-1 each appear exactly once (the _NNNNN suffix
    // before the codec extension is the writer's bucket id)
    val ids = parts.map { f =>
      "_([0-9]{5})\\.".r.findFirstMatchIn(f.getName).get.group(1).toInt
    }.sorted
    assert(ids.toSeq === (0 until BucketedJoin.NumBuckets))
  }
}
