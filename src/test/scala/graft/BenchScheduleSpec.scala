package graft

import org.scalatest.funsuite.AnyFunSuite

/** The r12 bench-harness hardening (VERDICT r11 #1), proven on a synthetic
  * noise model: a CONTIGUOUS wall-clock slow window (the r11 set_ops
  * 4.67 s-min-of-3 vs 0.57 s-isolated mode; r9's star_topk 9.90) poisons
  * every consecutive run of one key under key-major order, but at most one
  * pass of each key under [[Bench.interleavedSchedule]]'s pass-major
  * order — so the per-key min survives the outlier.
  */
class BenchScheduleSpec extends AnyFunSuite {

  private val keys = (1 to 20).map(i => f"q$i%02d")
  private val runs = 3
  private val base = 1.0
  private val slow = 10.0

  /** Execute a schedule against a simulated box where any slot STARTING
    * inside [w0, w0 + wLen) runs `slow`× — returns per-key observed times
    * in execution order. */
  private def simulate(schedule: Seq[(Int, String)], w0: Double,
      wLen: Double): Map[String, Seq[Double]] = {
    var clock = 0.0
    val out = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    schedule.foreach { case (_, k) =>
      val sec = if (clock >= w0 && clock < w0 + wLen) base * slow else base
      out(k) = out(k) :+ sec
      clock += sec
    }
    out.toMap
  }

  private def keyMajor(ks: Seq[String], r: Int): Seq[(Int, String)] =
    for (k <- ks.sorted; pass <- 1 to r) yield (pass, k)

  test("schedule covers every key exactly `runs` times, pass-major") {
    val s = Bench.interleavedSchedule(keys, runs)
    assert(s.size === keys.size * runs)
    keys.foreach(k => assert(s.count(_._2 == k) === runs))
    // pass-major: all of pass 1 precedes all of pass 2, etc.
    assert(s.map(_._1) === s.map(_._1).sorted)
    // within a pass, every key appears once
    (1 to runs).foreach { p =>
      assert(s.filter(_._1 == p).map(_._2) === keys.sorted)
    }
  }

  test("a slow window poisons a key-major key's min; interleaved min survives") {
    // window sized to swallow all 3 consecutive runs of one key (3 slow
    // slots of wall clock) but well under one full interleaved pass;
    // aligned to the slot starting at t=9 (the 10th slot in either order)
    val w0 = 9.0
    val wLen = 3 * slow
    val poisoned = simulate(keyMajor(keys, runs), w0, wLen)
    val poisonedMins = poisoned.map { case (k, ts) => k -> Bench.summarize(ts)._1 }
    // key-major: at least one key's EVERY run fell in the window → its min
    // is the 10× outlier, exactly the r11 set_ops record
    assert(poisonedMins.values.exists(_ == slow),
      s"expected a fully-poisoned key, got mins ${poisonedMins.values.toSeq.distinct.sorted}")

    val clean = simulate(Bench.interleavedSchedule(keys, runs), w0, wLen)
    clean.foreach { case (k, ts) =>
      val (mn, med) = Bench.summarize(ts)
      assert(mn === base, s"$k: interleaved min must dodge the window, got $ts")
      // the window spans < half a pass of 20 keys here, so the median-of-3
      // holds too (≤ 1 of 3 samples poisoned)
      assert(med === base, s"$k: interleaved median must survive one outlier, got $ts")
    }
  }

  test("summarize: min + upper median") {
    assert(Bench.summarize(Seq(3.0, 1.0, 2.0)) === ((1.0, 2.0)))
    assert(Bench.summarize(Seq(4.0, 1.0)) === ((1.0, 4.0)))
    assert(Bench.summarize(Seq(5.0)) === ((5.0, 5.0)))
  }
}
