package graft.operators

import graft.SparkSpec
import graft.sources.Sources.Pojo
import org.apache.spark.sql.functions._

case class KV(k: Long, v: Long)

/** Typed reduce (Aggregator) fidelity with the reference's
  * `reduce((a,b) -> Pojo(a.id+b.id))` — global and keyed folds match the
  * untyped sums. */
class TypedReduceSpec extends SparkSpec {

  test("global typed reduce == untyped sum (the windowAll analog)") {
    import spark.implicits._
    val pojos = graft.Tables.customer(spark, sf0001)
      .select(col("c_custkey").as("id")).as[Pojo]
    val reduced = pojos
      .select(TypedReduce.reduceColumn(Pojo(0L))((a, b) => Pojo(a.id + b.id)))
      .head()
    val expected = graft.Tables.customer(spark, sf0001)
      .agg(sum("c_custkey")).head().getLong(0)
    assert(reduced.id === expected)
  }

  test("keyed typed reduce == groupBy sum") {
    import spark.implicits._
    val ds = spark.range(1000L).select((col("id") % 7).as("k"), col("id").as("v")).as[KV]
    val typed = ds.groupByKey(_.k)
      .agg(TypedReduce.reduceColumn(KV(0L, 0L))((a, b) => KV(math.max(a.k, b.k), a.v + b.v)))
      .collect().map { case (k, kv) => k -> kv.v }.toMap
    val untyped = ds.toDF().groupBy("k").agg(sum("v").as("s"))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("s")).toMap
    assert(typed === untyped)
  }
}
