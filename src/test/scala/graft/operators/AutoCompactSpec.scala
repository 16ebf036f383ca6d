package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Self-maintaining incremental indexes: every arrival-mode `step` takes
  * an `autoCompact` threshold that sweeps the persisted index AFTER its
  * append ([[IndexMaintenance.autoCompact]]). These specs pin the two
  * properties that make the hook safe to leave on in a nightly pipeline:
  * (1) verdict parity — a step sequence run with auto-compaction returns
  * byte-identical survivors/spans/offsets to the same sequence without
  * it, and the final index holds the same logical rows; (2) bounded
  * fragments — the compacted run's per-bucket data-file count stays at
  * the threshold while the plain run accretes one file per append. */
class AutoCompactSpec extends SparkSpec {

  private def maxFragments(path: String): Int = {
    val m = IndexMaintenance.fragmentCounts(path)
    if (m.isEmpty) 0 else m.values.max
  }

  test("fp dedup: parity per step, bounded fragments, identical final index") {
    import spark.implicits._
    val plain = tmpDir("ac-fp-plain")
    val auto = tmpDir("ac-fp-auto")
    def batch(k: Int) =
      (0 until 12).map(i => (k * 100L + i, s"night$k doc$i payload"))
        .toDF("doc_id", "text")
    Seq(plain, auto).foreach { dir =>
      IncrementalDedup.writeFpIndex(
        IncrementalDedup.fingerprints(
          Seq((1L, "seed corpus doc")).toDF("doc_id", "text")).select("fp"),
        dir, nBuckets = 2)
    }
    (1 to 5).foreach { k =>
      val p = IncrementalDedup.step(spark, batch(k), plain, nBuckets = 2)
        .select("doc_id").as[Long].collect().sorted.toSeq
      val a = IncrementalDedup.step(spark, batch(k), auto, nBuckets = 2,
        autoCompact = 2)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(a === p, s"night $k survivors must not change under compaction")
    }
    // 12 fresh docs/night across 2 buckets: the plain index accretes one
    // file per bucket per append (seed + 5); the swept index stays at or
    // under threshold + the one append since its last sweep
    assert(maxFragments(plain) >= 5)
    assert(maxFragments(auto) <= 2)
    val pf = spark.read.parquet(plain).select("fp").as[String].collect().sorted
    val af = spark.read.parquet(auto).select("fp").as[String].collect().sorted
    assert(af === pf, "compaction must not add, drop, or alter index rows")
  }

  test("minhash near-dup: both sub-tables sweep, verdicts unchanged") {
    import spark.implicits._
    def doc(family: Int, variant: Int): String =
      (0 until 60).map { i =>
        if (i == 30 && variant > 0) s"f${family}v$variant" else s"f${family}w$i"
      }.mkString(" ")
    val plain = tmpDir("ac-mh-plain")
    val auto = tmpDir("ac-mh-auto")
    Seq(plain, auto).foreach { dir =>
      MinHashIncremental.writeBandIndex(
        MinHashIncremental.prepared(
          Seq((1L, doc(0, 0))).toDF("doc_id", "text")), dir, nBuckets = 2)
    }
    // three nights: each brings one twin of an indexed family (dies
    // cross-index) and one fresh family (survives, appends)
    (1 to 3).foreach { k =>
      val b = Seq((k * 10L, doc(k - 1, k)), (k * 10L + 1, doc(k, 0)))
        .toDF("doc_id", "text")
      val p = MinHashIncremental.step(spark, b, plain, nBuckets = 2)
        .select("doc_id").as[Long].collect().sorted.toSeq
      val a = MinHashIncremental.step(spark, b, auto, nBuckets = 2,
        autoCompact = 1)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(a === p && a === Seq(k * 10L + 1))
    }
    assert(maxFragments(MinHashIncremental.bandsSubPath(plain)) >= 3)
    assert(maxFragments(MinHashIncremental.bandsSubPath(auto)) <= 1)
    assert(maxFragments(s"$auto/sets") <= 1)
    val (pb, ps) = MinHashIncremental.readBandIndex(spark, plain)
    val (ab, as_) = MinHashIncremental.readBandIndex(spark, auto)
    assert(ab.count() === pb.count() &&
      as_.select("doc_id").as[Long].collect().sorted.toSeq ===
        ps.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("substring digests: spans identical under sweep, third occurrence still marks") {
    import spark.implicits._
    def spanSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val q8 = (1 to 8).map(j => s"q$j").mkString(" ")
    val plain = tmpDir("ac-ss-plain")
    val auto = tmpDir("ac-ss-auto")
    val nights = Seq(
      Seq((1L, s"a1 a2 $q8 a3"), (2L, s"b1 $q8 b2 b3")),   // in-batch pair
      Seq((10L, s"z1 z2 z3 $q8"),                           // third occurrence
        (11L, (1 to 20).map(j => s"y$j").mkString(" "))),
      Seq((20L, (1 to 20).map(j => s"y$j").mkString(" ")))) // re-arrival of y
    nights.zipWithIndex.foreach { case (n, i) =>
      val b = n.toDF("doc_id", "text")
      val p = spanSet(SubstringIncremental.step(spark, b, plain,
        nBuckets = 2, init = i == 0))
      val a = spanSet(SubstringIncremental.step(spark, b, auto,
        nBuckets = 2, init = i == 0, autoCompact = 1))
      assert(a === p, s"night ${i + 1} spans must not change under compaction")
      if (i == 2) assert(a === Set((20L, 1L, 20L, 20L)),
        "the swept index must still remember batch-2 noise")
    }
    assert(maxFragments(s"$plain/digests") >= 2)
    assert(maxFragments(s"$auto/digests") <= 1)
    val pg = spark.read.parquet(s"$plain/digests").select("g")
      .as[String].collect().sorted
    val ag = spark.read.parquet(s"$auto/digests").select("g")
      .as[String].collect().sorted
    assert(ag === pg)
  }

  test("curation: offsets, cursor, and fps identical when the fold is followed by a sweep") {
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_tok", "start_tok", "seq_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val plain = tmpDir("ac-cur-plain")
    val auto = tmpDir("ac-cur-auto")
    val nights = Seq(
      Seq((2L, "alpha beta gamma delta"), (4L, "one two three four")),
      Seq((1L, "five six seven eight"), (3L, "delta gamma beta alpha")),
      Seq((7L, "nine ten eleven twelve")))
    nights.zipWithIndex.foreach { case (n, i) =>
      val b = n.toDF("doc_id", "text")
      val p = rows(CurationIncremental.step(spark, b, plain,
        budget = 8, bucketWidth = 2, init = i == 0))
      val a = rows(CurationIncremental.step(spark, b, auto,
        budget = 8, bucketWidth = 2, init = i == 0, autoCompact = 1))
      assert(a === p, s"night ${i + 1} packed rows must not change")
    }
    assert(CurationIncremental.readCtl(spark, auto)._1 ===
      CurationIncremental.readCtl(spark, plain)._1)
    assert(maxFragments(s"$auto/fps") <= 1)
    val pf = spark.read.parquet(s"$plain/fps").select("fp")
      .as[String].collect().sorted
    val af = spark.read.parquet(s"$auto/fps").select("fp")
      .as[String].collect().sorted
    assert(af === pf)
  }
}
