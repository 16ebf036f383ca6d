package graft

/** Throwaway per-key profiling harness for the optimization round: times
  * one or more declared keys in isolation (same noop-sink methodology as
  * Bench) and optionally dumps the formatted plan. Not part of the bench
  * contract; removed or ignored by the driver.
  *
  * Usage: sbt "runMain graft.Scratch <key>[,<key>...] [runs] [explainDir]"
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val keys = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("pq_topk"))
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val explainDir = args.lift(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-scratch")
    keys.foreach { k =>
      // untimed warmup
      SparkEntry.queries(k)(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      explainDir.foreach { d =>
        val plan = SparkEntry.queries(k)(spark, sfDir).queryExecution
          .explainString(org.apache.spark.sql.execution.ExtendedMode)
        val fmt = SparkEntry.queries(k)(spark, sfDir).queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
        java.nio.file.Files.write(java.nio.file.Paths.get(d, s"$k.txt"),
          (fmt + "\n\n" + plan).getBytes("UTF-8"))
      }
      (1 to runs).foreach { p =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        SparkEntry.queries(k)(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"key":"$k","pass":$p,"sec":$sec%.3f}""")
        Console.out.flush()
      }
    }
    spark.stop()
  }
}
