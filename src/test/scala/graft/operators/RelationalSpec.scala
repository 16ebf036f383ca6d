package graft.operators

import graft.SparkSpec
import graft.functions.Funcs

/** Relational surface sanity on sf0.001 — cardinalities and key invariants
  * that are independent of the DuckDB oracle (which separately hash-checks
  * full results at sf0.01). */
class RelationalSpec extends SparkSpec {

  test("join_outer preserves every customer exactly once") {
    val customers = graft.Tables.customer(spark, sf0001).count()
    val out = Relational.joinOuter(spark, sf0001)
    assert(out.count() === customers)
    assert(out.filter("n_orders = 0 AND spend IS NOT NULL").count() === 0)
  }

  test("left outer join null side: unmatched keys get count 0 / null sum") {
    import spark.implicits._
    val left = Seq((1L, "a"), (2L, "b")).toDF("k", "name")
    val right = Seq((1L, 10.0)).toDF("rk", "amount")
    val out = left.join(right, $"k" === $"rk", "left_outer")
      .groupBy("k").agg(
        org.apache.spark.sql.functions.count($"rk").as("n"),
        org.apache.spark.sql.functions.sum($"amount").as("s"))
      .collect().map(r => r.getAs[Long]("k") -> r).toMap
    assert(out(1L).getAs[Long]("n") === 1L)
    assert(out(2L).getAs[Long]("n") === 0L)
    assert(out(2L).isNullAt(out(2L).fieldIndex("s")))
  }

  test("join_semi + join_anti partition: anti customers have no orders") {
    val out = Relational.joinSemi(spark, sf0001).collect()
    val semi = out.filter(_.getAs[String]("how") == "semi").map(_.getAs[Long]("c_custkey")).toSet
    val anti = out.filter(_.getAs[String]("how") == "anti").map(_.getAs[Long]("c_custkey")).toSet
    assert(semi.intersect(anti).isEmpty)
  }

  test("set_ops algebra: |union| = |A| + |B| - |intersect|; except ∩ intersect = ∅") {
    val rows = Relational.setOps(spark, sf0001).collect()
    val byOp = rows.groupBy(_.getAs[String]("op")).view.mapValues(_.map(_.getAs[Long]("k")).toSet).toMap
    val (u, i, e) = (byOp("union"), byOp.getOrElse("intersect", Set.empty[Long]), byOp("except"))
    assert(e.intersect(i).isEmpty)
    assert((e ++ i).subsetOf(u))
    assert(u.size === e.size + i.size + (u -- e -- i).size)
  }

  test("rollup_agg: grand total row equals table count") {
    val total = graft.Tables.lineitem(spark, sf0001).count()
    val all = Relational.rollupAgg(spark, sf0001)
      .filter("flag = 'ALL' AND status = 'ALL'").collect()
    assert(all.length === 1)
    assert(all(0).getAs[Long]("n") === total)
  }

  test("topk is ordered descending and bounded") {
    val rows = Relational.topk(spark, sf0001).collect()
    assert(rows.length === 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("dedup keeps exactly one earliest row per (user_id, event_type)") {
    val out = Relational.dedup(spark, sf0001)
    assert(out.groupBy("user_id", "event_type").count().filter("count > 1").count() === 0)
    val events = graft.Tables.events(spark, sf0001)
    val expected = events.select("user_id", "event_type").distinct().count()
    assert(out.count() === expected)
  }

  test("win_rank keeps at most 3 rows per customer, rn contiguous from 1") {
    val out = Relational.winRank(spark, sf0001)
    val bad = out.groupBy("o_custkey")
      .agg(org.apache.spark.sql.functions.expr("count(*) as c"),
        org.apache.spark.sql.functions.expr("max(rn) as mx"),
        org.apache.spark.sql.functions.expr("min(rn) as mn"))
      .filter("c > 3 OR mx != c OR mn != 1")
    assert(bad.count() === 0)
  }

  test("bloom pre-filter keeps every true join key and prunes most others") {
    import org.apache.spark.sql.functions.{col, expr}
    val dir = sf0001
    val li = graft.Tables.lineitem(spark, dir)
    val trueKeys = graft.Tables.orders(spark, dir)
      .filter(col("o_totalprice") > BloomJoin.PriceMin)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    graft.functions.SqlSurface.registerViews(spark, dir, Seq("orders"))
    val pruned = li.filter(expr(
      s"""graft_might_contain(
         |  (SELECT graft_bloom_agg(xxhash64(o_orderkey))
         |   FROM orders WHERE o_totalprice > ${BloomJoin.PriceMin}),
         |  xxhash64(l_orderkey))""".stripMargin))
      .select("l_orderkey").collect().map(_.getLong(0))
    // no false negatives: every lineitem of a qualifying order survives
    val total = li.count()
    val trueMatches = li.filter(col("l_orderkey").isInCollection(trueKeys)).count()
    assert(pruned.count(trueKeys) === trueMatches,
      "bloom must never drop a real join key")
    // and it actually prunes: at ~20 % dim selectivity and 1 % target FPP
    // the survivor set stays well under half the fact table
    assert(pruned.length < total / 2,
      s"bloom kept ${pruned.length} of $total rows — not pruning")
  }

  test("scalar_funcs buckets respect their thresholds") {
    val out = Funcs.scalarFuncs(spark, sf0001)
    assert(out.filter("bucket = 'high' AND price_floor <= 300000").count() === 0)
    assert(out.filter("bucket = 'low' AND price_floor > 150000").count() === 0)
    assert(out.filter("status_co = 'O'").count() === 0, "nullif/coalesce folds O to OPEN")
  }
}
