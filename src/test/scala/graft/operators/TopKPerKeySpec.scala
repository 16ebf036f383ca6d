package graft.operators

import graft.SparkSpec

/** Bounded-heap per-key top-k == window row_number form, without per-key
  * sorting. */
class TopKPerKeySpec extends SparkSpec {

  test("topOrdersPerCustomer matches winRank's rows exactly") {
    val heap = TopKPerKey.topOrdersPerCustomer(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Int]("rn"),
        r.getAs[Long]("o_orderkey"), r.getAs[Double]("o_totalprice")))
    val window = Relational.winRank(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Int]("rn"),
        r.getAs[Long]("o_orderkey"), r.getAs[Double]("o_totalprice")))
    assert(heap.length === window.length)
    heap.zip(window).foreach { case (h, w) => assert(h === w) }
  }

  test("partial aggregation bounds what crosses the shuffle") {
    // plan must show a two-stage (partial + final) aggregate on the udaf,
    // i.e. ObjectHashAggregate/SortAggregate pairs — not a Window sort
    val plan = TopKPerKey.topOrdersPerCustomer(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "no window sort in the heap form")
    assert(plan.contains("Aggregate"), plan.take(500))
  }
}
