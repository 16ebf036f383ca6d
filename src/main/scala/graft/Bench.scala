package graft
/** Per-round benchmark: every declared query against SPARK_GRAFT_SF_DIR,
  * timed with a noop-format write so the FULL plan executes (a count() lets
  * Catalyst prune aggregate expressions and the final sort — VERDICT r1 #2).
  * Failures are surfaced per-query in an "errors" map instead of silently
  * reporting a plausible timing. One JSON line on stdout.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Timed passes per key (default 3 → median-of-3). A constrained box can
    // set SPARK_GRAFT_BENCH_RUNS=1: one timed pass after the untimed warmup
    // still yields steady-state numbers, in a third of the wall clock —
    // BENCH_r09 timed out (rc 124) on an overloaded driver box and recorded
    // nothing, which is worse than a 1-run record.
    // malformed values degrade to the default — a typo'd env var must not
    // itself reproduce the blank-round failure this knob exists to prevent
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS")
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
      .filter(_ >= 1).getOrElse(3)
    val spark = Engine.session("graft-bench")
    // Untimed warmup pass: JIT + whole-stage-codegen compilation costs ~6-7 s
    // on the first query and would swamp the sub-second steady-state numbers
    // (measured in r2: first run 7.2 s, second 0.75 s for the same plan).
    // Recorded in BASELINE.md: r2+ numbers are steady-state.
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // Drop anything the warmup pass persisted (e.g. Sessionize's summary
    // cache) so timed runs do their own full work.
    spark.catalog.clearCache()
    // MEDIAN of three timed runs per query (plus the min for reference):
    // two-run min let a single noisy scheduler window fake a 4× per-query
    // swing in the r2/r3 driver benches (VERDICT r3 — box interference,
    // re-run clean at 1.02× baseline); the median of three absorbs one
    // outlier run entirely without changing what is measured
    def jq(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var err: Option[String] = None
      val times = (1 to runs).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => err = Some(e.toString.takeWhile(_ != '\n').take(160)) }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = times(times.length / 2) // median (upper for even run counts)
      // One line per key, emitted AS MEASURED and flushed: a run killed
      // mid-flight (BENCH_r09: rc 124 on an overloaded box) still leaves
      // every completed key's timing in the captured stdout instead of an
      // all-or-nothing blank round.
      println(s"""{"key":${jq(name)},"median":$med,"min":${times.head},"runs":$runs${err.map(e => s""","err":${jq(e)}""").getOrElse("")}}""")
      Console.out.flush()
      (name, med, times.head, err)
    }
    val qs = results.map { case (k, med, _, _) => s"${jq(k)}:$med" }.mkString("{", ",", "}")
    val mins = results.map { case (k, _, mn, _) => s"${jq(k)}:$mn" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, Some(e)) => s"${jq(k)}:${jq(e)}" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_min":$mins,"errors":$errs,"sf":"$sfDir"}""")
    // The per-query line above grows with the key count and can exceed a
    // tail-capture window (BENCH_r04 recorded "parsed": null); a second,
    // SHORT summary line keeps the headline number parseable no matter how
    // many queries the long line carries.
    val nErrs = results.count(_._4.isDefined)
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_errors":$nErrs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
