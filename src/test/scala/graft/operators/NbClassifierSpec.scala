package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** NB log-odds classifier: the declared key is oracle-gated at sf0.01
  * (the oracle retrains the count model); these specs pin the odds math
  * by hand and the discriminative direction on the fixture. */
class NbClassifierSpec extends SparkSpec {

  test("trainLogOdds: hand-checked odds on a 2-class corpus, OOV floors") {
    import spark.implicits._
    // pos tokens: good×3, both×1; neg tokens: bad×2, both×2
    val labeled = Seq(
      ("good good good both", true),
      ("bad bad both both", false)).toDF("text", "pos")
    val row = NbClassifier.trainLogOdds(labeled).collect()(0)
    val model = row.getAs[Map[String, Long]]("model")
    val np = 4.0; val nn = 4.0; val v = 3.0
    def micro(p: Double): Long = math.round(math.log10(p) * 1e6)
    def odds(cp: Long, cn: Long): Long =
      micro((cp + 1) / (np + v + 1)) - micro((cn + 1) / (nn + v + 1))
    assert(model === Map(
      "good" -> odds(3, 0), "bad" -> odds(0, 2), "both" -> odds(1, 2)))
    assert(row.getAs[Long]("oov") === odds(0, 0))
    assert(model("good") > 0 && model("bad") < 0,
      "class-exclusive tokens must carry signed odds")
  }

  test("declared key separates the weak classes: keep docs average above drop docs") {
    val scored = NbClassifier.nbScore(spark, sf0001)
    val docs = graft.Tables.documents(spark, sf0001).select("doc_id", "text")
    val labels = TextOps.quality(docs)
      .select(col("doc_id"), (col("verdict") === "keep").as("pos"))
    val means = scored.join(labels, "doc_id")
      .groupBy("pos").agg(avg("odds_mean").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(means(true) > means(false),
      s"keep mean ${means(true)} must exceed drop mean ${means(false)}")
    assert(scored.count() === docs.count())
    spark.catalog.clearCache()
  }
}
