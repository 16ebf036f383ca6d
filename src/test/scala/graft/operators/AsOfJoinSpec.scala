package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** As-of join semantics: latest right ≤ left per key, equal timestamps
  * match, lefts with no prior right get null (dropped by the inner form). */
class AsOfJoinSpec extends SparkSpec {

  def ts(s: Long) = new Timestamp(s * 1000L)

  test("asOf picks the latest right at-or-before each left row per key") {
    import spark.implicits._
    val clicks = Seq((1L, ts(10), 100L), (1L, ts(20), 101L), (2L, ts(5), 102L))
      .toDF("user_id", "ts", "event_id")
    val views = Seq((1L, ts(10), 900L), (1L, ts(15), 901L), (2L, ts(7), 902L))
      .toDF("user_id", "ts", "event_id")
    val out = AsOfJoin.asOf(clicks, views, "user_id", "ts", "event_id")
      .orderBy("user_id", "ts").collect()
    // click@10 matches view@10 (equal ts matches — <= semantics)
    assert(out(0).getAs[Long]("asof_val") === 900L)
    // click@20 matches view@15 (the LATEST prior, not the first)
    assert(out(1).getAs[Long]("asof_val") === 901L)
    // user 2 click@5: no view at/before 5 → null (inner form drops it)
    assert(out(2).isNullAt(out(2).fieldIndex("asof_val")))
  }

  test("randomized cross-check: 30 random instances vs in-memory brute force") {
    // The window formulation (union + last-over-window) is subtle enough
    // to deserve the union-find treatment the CC loop got: random keys,
    // CLUSTERED timestamps (small range forces equal-ts collisions on and
    // across sides — exactly the tie-break paths the planted spec above
    // can't enumerate), nulls absent by construction. Ground truth is the
    // 5-line definition itself: latest right ts <= left ts per key,
    // largest value among right rows sharing (key, ts).
    import spark.implicits._
    val rnd = new scala.util.Random(0xA50FL)
    for (round <- 0 until 30) {
      val nl = 1 + rnd.nextInt(30)
      val nr = rnd.nextInt(30) // 0 right rows is a valid instance
      val lefts = (0 until nl).map(i =>
        (1L + rnd.nextInt(4), ts(rnd.nextInt(12).toLong), 100L + i))
      val rights = (0 until nr).map(i =>
        (1L + rnd.nextInt(4), ts(rnd.nextInt(12).toLong), 900L + rnd.nextInt(8)))
      val got = AsOfJoin.asOf(
          lefts.toDF("user_id", "ts", "event_id"),
          rights.toDF("user_id", "ts", "event_id"),
          "user_id", "ts", "event_id")
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("ts"),
          r.getAs[Long]("event_id"),
          Option(r.getAs[Timestamp]("asof_ts")), Option(r.getAs[Any]("asof_val"))))
        .toSet
      val want = lefts.map { case (k, lts, lid) =>
        val matches = rights.filter(r => r._1 == k && !r._2.after(lts))
        if (matches.isEmpty) (k, lts, lid, None, None)
        else {
          val m = matches.maxBy(r => (r._2.getTime, r._3))
          (k, lts, lid, Some(m._2), Some(m._3))
        }
      }.toSet
      assert(got === want, s"round $round: nl=$nl nr=$nr")
    }
  }
}
