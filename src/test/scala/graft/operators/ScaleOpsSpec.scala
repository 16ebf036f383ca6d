package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scale-path operators: SimHash text near-dup, sketch aggregates with
  * error bounds, salted aggregation equivalence, and bucketed co-located
  * joins (shuffle elimination). */
class ScaleOpsSpec extends SparkSpec {

  test("SimHash finds edited near-dup text within hamming budget, skips unrelated") {
    import spark.implicits._
    val base = (1 to 80).map(i => s"tok$i").mkString(" ")
    val edited = (1 to 80).map(i => if (i % 40 == 0) "EDIT" else s"tok$i").mkString(" ")
    val unrelated = (1 to 80).map(i => s"zzz$i").mkString(" ")
    val pairs = SimHashDedup.nearDupPairs(
      Seq((0L, base), (1L, edited), (2L, unrelated)).toDF("doc_id", "text")).collect()
    assert(pairs.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet === Set((0L, 1L)))
    assert(pairs(0).getAs[Int]("dist") <= SimHashDedup.hammingMax)
  }

  test("SimHash on testdata documents finds the planted near-dup pairs") {
    val docs = graft.Tables.documents(spark, sf0001).select("doc_id", "text")
    val sim = SimHashDedup.nearDupPairs(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val minhash = MinHashDedup.dedupMinhash(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // SimHash (bag-of-words, hamming<=3) and MinHash (3-gram jaccard>=0.8)
    // measure different similarities; require substantial overlap, no exact set equality
    assert(minhash.nonEmpty)
    assert(sim.intersect(minhash).size.toDouble / minhash.size >= 0.5,
      s"simhash found ${sim.size} pairs, overlap ${sim.intersect(minhash).size}/${minhash.size}")
  }

  test("banding recall self-check: all TRUE on testdata, FALSE when banding is sabotaged") {
    val docs = graft.Tables.documents(spark, sf0001).select("doc_id", "text")
    val ok = SimHashDedup.bandingRecallCheck(docs)
    assert(ok.count() === docs.count(), "one verdict row per document")
    assert(ok.filter(!col("recall_ok")).count() === 0,
      "pigeonhole banding must find every brute-force hamming pair")
    // negative control: cap every bucket away → banding finds nothing, so
    // every doc in a brute-force pair must flip to FALSE (the declared key
    // would go red). Guards the check itself against vacuous truth.
    val pairedDocs = SimHashDedup.bandingRecallCheck(docs, maxBucketSize = 0)
      .filter(!col("recall_ok")).count()
    assert(pairedDocs > 0, "sabotaged banding must produce FALSE verdicts")
    spark.catalog.clearCache()
  }

  test("approx_count_distinct within rsd bounds of exact") {
    val rows = Sketches.approxVsExact(spark, sf0001).collect()
    rows.foreach { r =>
      val (a, e) = (r.getAs[Long]("approx_supp").toDouble, r.getAs[Long]("exact_supp").toDouble)
      assert(math.abs(a - e) / e <= 0.1, s"approx $a vs exact $e")
      val (ap, ep) = (r.getAs[Long]("approx_part").toDouble, r.getAs[Long]("exact_part").toDouble)
      assert(math.abs(ap - ep) / ep <= 0.1, s"approx $ap vs exact $ep")
    }
  }

  test("approx_percentile close to exact percentiles") {
    val r = Sketches.approxQuantiles(spark, sf0001).head()
    val approx = r.getSeq[Double](0)
    val exact = r.getSeq[Double](1)
    approx.zip(exact).foreach { case (a, e) =>
      assert(math.abs(a - e) / e <= 0.05, s"approx $a vs exact $e")
    }
  }

  test("salted aggregation equals direct aggregation on skewed data") {
    // 90% of rows share one key — the salted form must still be exact
    val skewed = spark.range(100000L)
      .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"),
        col("id").as("v"))
    val salted = SkewedAgg.saltedCountSum(skewed, "k", "v")
      .collect().map(r => (r.getAs[Long]("k"), (r.getAs[Long]("n"), r.getAs[Long]("s")))).toMap
    val direct = skewed.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getAs[Long]("k"), (r.getAs[Long]("n"), r.getAs[Long]("s")))).toMap
    assert(salted === direct)
  }

  test("bucketed co-located join plans without a shuffle exchange") {
    val wh = tmpDir("bucketed-wh")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.Tables.orders(spark, sf0001)
        .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$wh/orders_b").saveAsTable("orders_b")
      graft.Tables.customer(spark, sf0001)
        .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$wh/customer_b").saveAsTable("customer_b")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() === graft.Tables.orders(spark, sf0001).count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
