package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Throwaway scale probe (deleted after recording results in BASELINE.md). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("graft-scratch")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // 100k deterministic pseudo-random vectors, dim 64
    val emb = spark.range(100000L).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), i -> cast(pmod(xxhash64(id, i), 1000) as double) / 500.0 - 1.0)").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    emb.count()

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup both paths
    noop(emb.select(call_function("graft_vec_simhash", col("v"), lit(16)).as("h")))
    noop(emb.limit(1000).select(Similarity.hofSimhash(col("v"), 16).as("h")))

    time("vec_simhash kernel, 100k x dim64, bits=16")(
      noop(emb.select(call_function("graft_vec_simhash", col("v"), lit(16)).as("h"))))
    time("vec_simhash HOF,    100k x dim64, bits=16")(
      noop(emb.select(Similarity.hofSimhash(col("v"), 16).as("h"))))

    // embedDedup at 100k with 1000 planted exact duplicates
    val dups = emb.filter(col("vec_id") < 1000)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("v"))
    val all = emb.unionByName(dups)
    val n = time("embedDedup 101k vectors (ids-only probe join)")(
      Similarity.embedDedup(all).count())
    println(s"[probe] embedDedup pairs found: $n (expect >= 1000 planted)")

    // ann_topk recall verdict at sf0.1 (bench SF — gate runs at sf0.01)
    Similarity.annRecall(spark, "/root/testdata/sf0.1").collect()
      .foreach(r => println(s"[probe] annRecall sf0.1: $r"))

    spark.stop()
  }
}
