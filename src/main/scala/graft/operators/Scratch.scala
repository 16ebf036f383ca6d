package graft.operators

import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session()
    VideoPhash.ensureVideoPhashFixture(spark)
    val fix = spark.read.parquet(VideoPhash.videoFixturePath)
    val emb = VideoEmbed.videoEmbedFrame(fix.select("media_id", "payload")).persist()
    val meta = fix.select(col("media_id"), col("twin_of"), col("kind"))
    val withMeta = emb.join(meta, "media_id")
    val dot = aggregate(zip_with(col("a.v"), col("b.v"), (x, y) => x * y),
      lit(0d), (s, x) => s + x)
    def nrm(c: org.apache.spark.sql.Column) =
      sqrt(aggregate(transform(c, x => x * x), lit(0d), (s, x) => s + x))
    val twins = withMeta.filter(col("twin_of").isNotNull).as("a")
      .join(withMeta.filter(col("kind") === "base").as("b"),
        col("a.twin_of") === col("b.media_id"))
      .select(col("a.kind").as("kind"),
        (dot / (nrm(col("a.v")) * nrm(col("b.v")))).as("cos"))
    twins.groupBy("kind").agg(min("cos"), avg("cos")).show(false)
    val bases = withMeta.filter(col("kind") === "base")
    bases.as("a").join(bases.as("b"), col("a.media_id") < col("b.media_id"))
      .select((dot / (nrm(col("a.v")) * nrm(col("b.v")))).as("cos"))
      .agg(max("cos"), avg("cos")).show(false)
    spark.stop()
  }
}
