package graft
import org.apache.spark.sql.functions._
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("pq-probe")
    import graft.operators._
    // warmup
    SparkEntry.queries("pq_topk")(spark, sfDir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STEP $label%-24s ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    (1 to 2).foreach { _ =>
      spark.catalog.clearCache()
      val emb = t("normalize+persist") {
        val e = ProductQuant.normalized(Tables.embeddings(spark, sfDir)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        e.count(); e
      }
      val cbs = t("trainCodebooks") { ProductQuant.trainCodebooks(spark, emb) }
      val queries = emb.filter(col("vec_id") < Similarity.NumQueryVecs)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      t("pqSearch") { ProductQuant.pqSearch(emb, queries, cbs).write.format("noop").mode("overwrite").save() }
      t("simTopk(exact)") { Similarity.simTopk(spark, sfDir).write.format("noop").mode("overwrite").save() }
      t("full pqRecall") { SparkEntry.queries("pq_topk")(spark, sfDir).write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
