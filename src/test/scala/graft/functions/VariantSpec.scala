package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Spark 4 VARIANT type for semi-structured data: parse_json → variant,
  * typed extraction with variant_get, agreement with the schema'd
  * from_json path on the events.props column. Variant is the
  * open-schema scale path (no upfront schema; per-path typed access with
  * shredded storage) complementing the declared-schema json_funcs. */
class VariantSpec extends SparkSpec {

  test("parse_json + variant_get agree with from_json on events.props") {
    val df = graft.Tables.events(spark, sf0001)
      .withColumn("v", parse_json(col("props")))
      .withColumn("k_variant", expr("variant_get(v, '$.k', 'long')"))
      .withColumn("k_schema", from_json(col("props"), "k LONG", Map.empty[String, String]).getField("k"))
    assert(df.filter(col("k_variant") =!= col("k_schema")).count() === 0)
    assert(df.filter(col("k_variant").isNull).count() === 0)
  }

  test("variant handles heterogeneous shapes without a declared schema") {
    import spark.implicits._
    val df = Seq(
      """{"a": 1, "b": "x"}""",
      """{"a": 2.5}""",
      """{"a": [1, 2, 3], "c": {"d": true}}""").toDF("j")
      .withColumn("v", parse_json(col("j")))
    val rows = df.select(
      expr("variant_get(v, '$.a')").cast("string").as("a"),
      expr("variant_get(v, '$.c.d', 'boolean')").as("d")).collect()
    assert(rows(0).getAs[String]("a") === "1")
    assert(rows(1).getAs[String]("a") === "2.5")
    assert(rows(2).getAs[String]("a") === "[1,2,3]")
    assert(rows(2).getAs[Boolean]("d") === true)
  }
}
