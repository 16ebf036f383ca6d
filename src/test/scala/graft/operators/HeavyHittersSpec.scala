package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Misra-Gries heavy hitters — the guarantees are deterministic even though
  * the point estimates are not, so every test checks the bounds, never an
  * exact summary (except the k > distinct case, where MG IS exact). The
  * randomized sweep is the same falsification class that caught the r2
  * monotone-minhash and r9 scrambled-path CC bugs: shapes nobody pinned.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Check both MG guarantees for one stream/k against exact counts. */
  private def assertGuarantees(xs: Seq[String], k: Int, parts: Int): Unit = {
    val ds = spark.createDataset(xs).repartition(parts)
    val rows = HeavyHitters.heavyHitters(ds, k).collect()
    val est = rows.map(r => r.getAs[String]("key") -> r.getAs[Long]("est")).toMap
    val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = xs.size.toLong

    assert(rows.length <= k - 1, s"summary ${rows.length} > k-1=${k - 1}")
    rows.foreach(r => assert(r.getAs[Long]("processed") == n))
    // survival: every key with cnt·k > n is in the summary
    exact.foreach { case (key, cnt) =>
      if (cnt * k > n)
        assert(est.contains(key), s"guaranteed-heavy '$key' (cnt=$cnt, n=$n, k=$k) evicted")
    }
    // bounds: cnt − n/k ≤ est ≤ cnt for every surviving key
    est.foreach { case (key, e) =>
      val cnt = exact.getOrElse(key, 0L)
      assert(e <= cnt, s"'$key' est $e > exact $cnt")
      assert(k * (cnt - e) <= n, s"'$key' est $e < $cnt - $n/$k")
    }
  }

  test("guarantees hold on a zipf-ish stream across k and partition layouts") {
    val rnd = new scala.util.Random(7)
    // zipf-ish: key i with weight ~ 1/(i+1)
    val xs = Seq.fill(4000)(s"k${(math.pow(rnd.nextDouble(), 3) * 40).toInt}")
    for (k <- Seq(2, 3, 5, 10, 41); parts <- Seq(1, 7))
      assertGuarantees(xs, k, parts)
  }

  test("randomized cross-check: 40 random streams vs exact counts") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 40) {
      val card = 1 + rnd.nextInt(30)
      val size = 50 + rnd.nextInt(500)
      // mix of uniform and heavily skewed draws
      val xs = Seq.fill(size) {
        if (rnd.nextBoolean() && rnd.nextBoolean()) "hot"
        else s"k${rnd.nextInt(card)}"
      }
      assertGuarantees(xs, 2 + rnd.nextInt(12), 1 + rnd.nextInt(6))
    }
  }

  test("k above the distinct count makes the summary exact") {
    val xs = Seq.fill(300)(s"k${new scala.util.Random(3).nextInt(5)}") ++
      (1 to 200).map(i => s"k${i % 5}")
    val ds = spark.createDataset(xs).repartition(5)
    val rows = HeavyHitters.heavyHitters(ds, 20).collect()
    val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rows.length == exact.size)
    rows.foreach { r =>
      assert(r.getAs[Long]("est") == exact(r.getAs[String]("key")))
    }
  }

  test("declared heavy_hitters key: en is guaranteed-heavy, all verdicts true") {
    val rows = HeavyHitters.heavyHittersChecked(spark, sf0001).collect()
    assert(rows.length == HeavyHitters.CheckedKs.length) // {en} per k
    rows.foreach { r =>
      assert(r.getAs[String]("key") == "en")
      assert(r.getAs[Boolean]("survived_ok"), s"survival failed: $r")
      assert(r.getAs[Boolean]("bound_ok"), s"bound failed: $r")
    }
  }
}
