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
}
