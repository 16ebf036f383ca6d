package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.sql.Timestamp

/** Property-based invariants for the two-phase sessionizer (SURVEY.md §5.2):
  * on ANY event set, (1) event count is preserved, (2) every event falls in
  * exactly one session span, (3) distinct sessions are > gap apart.
  * Raw scalacheck generators driven from fixed seeds (the
  * scalatest-scalacheck bridge isn't in the offline cache) — deterministic
  * across runs.
  */
class SessionPropertySpec extends SparkSpec {

  val gapUs = 5000000L      // 5 s
  val bucketUs = 60000000L  // 1 min

  val tsGen: Gen[List[Long]] =
    Gen.chooseNum(1, 120).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 600L)).map(_.map(_ * 500000L))) // 0..300 s, 0.5 s grid

  test("sessionize invariants hold for 20 seeded random event sets") {
    import spark.implicits._
    (1 to 20).foreach { seed =>
      val usList = tsGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val df = usList.map(us => new Timestamp(us / 1000L)).toDF("ts")
      val sessions = Sessionize.globalSessions(df, "ts", gapUs, bucketUs)
        .orderBy("s_start_us").collect()
      withClue(s"seed=$seed events=${usList.sorted} ") {
        // (1) counts preserved
        assert(sessions.map(_.getAs[Long]("total")).sum === usList.length.toLong)
        // (3) spans consistent and separated by more than the gap
        val spans = sessions.map(r => (r.getAs[Long]("s_start_us"), r.getAs[Long]("s_last_us")))
        spans.foreach { case (s, e) => assert(s <= e) }
        spans.sliding(2).foreach {
          case Array((_, e1), (s2, _)) => assert(s2 - e1 > gapUs)
          case _ =>
        }
        // (2) every event in exactly one span
        usList.foreach { us =>
          assert(spans.count { case (s, e) => us >= s && us <= e } === 1)
        }
      }
    }
  }
}
