package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Windowed-aggregation semantics (SURVEY.md §2.3), incl. the exact-gap
  * boundary rule and equivalence of the two-phase sessionizer with the
  * built-in `session_window`. */
class WindowsSpec extends SparkSpec {

  test("session_window merges events exactly gap apart (boundary rule)") {
    import spark.implicits._
    val df = Seq("2024-01-01 00:00:00", "2024-01-01 00:00:05", "2024-01-01 00:00:11")
      .map(Timestamp.valueOf).toDF("ts")
    val sessions = df.groupBy(session_window(col("ts"), "5 seconds"))
      .agg(count(lit(1)).as("n")).orderBy("session_window.start").collect()
    assert(sessions.length === 2, "t=0 and t=5 merge; t=11 (6 s later) does not")
    assert(sessions(0).getAs[Long]("n") === 2)
  }

  test("two-phase Sessionize == built-in session_window on sf0.001") {
    val twoPhase = Windows.sessionCount(spark, sf0001).collect()
    val builtin  = Windows.sessionCountBuiltin(spark, sf0001).collect()
    assert(twoPhase.length === builtin.length)
    twoPhase.zip(builtin).foreach { case (a, b) => assert(a === b) }
  }

  test("two-phase Sessionize handles sessions chaining across bucket boundaries") {
    import spark.implicits._
    // bucket = 10 s, gap = 3 s; events every 2 s from t=5 to t=35 form ONE
    // session spanning 4 buckets; plus an isolated event far away.
    val ts = ((5 to 35 by 2).map(_.toLong) :+ 100L).map(s => new Timestamp(s * 1000L))
    val df = ts.toDF("ts")
    val out = Sessionize.globalSessions(df, "ts", gapUs = 3000000L, bucketUs = 10000000L)
      .orderBy("s_start_us").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("s_start_us") === 5000000L)
    assert(out(0).getAs[Long]("s_last_us") === 35000000L)
    assert(out(0).getAs[Long]("total") === 16)
    assert(out(1).getAs[Long]("total") === 1)
  }

  test("tumbling windows are inclusive-start exclusive-end") {
    import spark.implicits._
    val df = Seq(0L, 9L, 10L).map(s => new Timestamp(s * 1000L)).toDF("ts")
    val rows = df.groupBy(window(col("ts"), "10 seconds")).agg(count(lit(1)).as("n"))
      .orderBy("window.start").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Long]("n") === 2, "t=0 and t=9 in [0,10); t=10 in [10,20)")
  }
}
