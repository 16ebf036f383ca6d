package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental NEAR-dup against a persisted band index: the declared key
  * is oracle-gated at sf0.01 (brute-force trigram-Jaccard over the
  * parity split); these specs pin the batch semantics — in-batch
  * keep-first over VERIFIED pairs, index probe + exact verify, index
  * append, short-doc survival — on crafted corpora with hand-checkable
  * ground truth. */
class MinHashIncrementalSpec extends SparkSpec {

  /** ~60-token docs around a shared base so Jaccard is high for twins
    * (one token changed → J ≈ 57/63 ≈ 0.90) and near zero across
    * families. */
  private def doc(family: Int, variant: Int): String =
    (0 until 60).map { i =>
      if (i == 30 && variant > 0) s"f${family}v$variant" else s"f${family}w$i"
    }.mkString(" ")

  test("dedupNearAgainst: in-batch near-dup keeps lowest id; index twin dies; fresh and short docs survive") {
    import spark.implicits._
    val idxPrep = MinHashIncremental.prepared(
      Seq((2L, doc(0, 0))).toDF("doc_id", "text"))
    val batch = Seq(
      (10L, doc(0, 1)),   // near-dup of index doc 2 → dropped
      (11L, doc(1, 0)),   // fresh family → kept
      (12L, doc(1, 1)),   // in-batch near-dup of 11 → dropped
      (13L, doc(2, 0)),   // fresh → kept
      (14L, "tiny doc"))  // <3 tokens: no shingles, must SURVIVE
      .toDF("doc_id", "text")
    val got = MinHashIncremental.dedupNearAgainst(batch,
        MinHashIncremental.bandRows(idxPrep),
        idxPrep.select("doc_id", "hset"))
      .select("doc_id").as[Long].collect().sorted
    assert(got === Array(11L, 13L, 14L))
  }

  test("step: survivors append so the next batch near-dedups against them") {
    import spark.implicits._
    val dir = tmpDir("bandidx")
    MinHashIncremental.writeBandIndex(
      MinHashIncremental.prepared(Seq((1L, doc(0, 0))).toDF("doc_id", "text")),
      dir, nBuckets = 4)
    val s1 = MinHashIncremental.step(spark,
      Seq((10L, doc(1, 0)), (11L, doc(0, 2))).toDF("doc_id", "text"),
      dir, nBuckets = 4)
    assert(s1.select("doc_id").as[Long].collect().toSeq === Seq(10L))
    // batch 2: doc 20 near-dups batch 1's SURVIVOR → must die against
    // the appended index, not just the original
    val s2 = MinHashIncremental.step(spark,
      Seq((20L, doc(1, 3)), (21L, doc(3, 0))).toDF("doc_id", "text"),
      dir, nBuckets = 4)
    assert(s2.select("doc_id").as[Long].collect().toSeq === Seq(21L))
    // index holds state for the three distinct families (1 seed + 2
    // appended survivors), both sub-tables bucketed
    val (bands, sets) = MinHashIncremental.readBandIndex(spark, dir)
    assert(sets.select("doc_id").distinct().count() === 3)
    assert(bands.select("doc_id").distinct().count() === 3)
    assert(bands.columns.toSet === Set("doc_id", "band", "sig", "bucket"))
    assert(sets.columns.toSet === Set("doc_id", "hset", "bucket"))
  }

  test("verification is exact: a band collision below the Jaccard threshold is not dropped") {
    import spark.implicits._
    // Two docs sharing a long common prefix (identical first 30 tokens →
    // many shared shingles, likely shared bands) but diverging after:
    // exact J well under 0.8, so the verify stage must keep both.
    val shared = (0 until 30).map(i => s"s$i").mkString(" ")
    val a = shared + " " + (0 until 30).map(i => s"a$i").mkString(" ")
    val b = shared + " " + (0 until 30).map(i => s"b$i").mkString(" ")
    val prep = MinHashIncremental.prepared(
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"))
      .persist()
    val empty = prep.filter(lit(false))
    val drops = MinHashIncremental.nearDupDrops(prep,
      MinHashIncremental.bandRows(empty), empty.select("doc_id", "hset"))
    assert(drops.count() === 0)
    prep.unpersist()
  }

  test("band index paths carry the minhash kernel version; the unversioned r14 layout still reads (r15)") {
    import spark.implicits._
    val kv = graft.plans.MinHashSignatureExpr.KernelVersion
    val dir = tmpDir("bandidx-kv")
    val prep = MinHashIncremental.prepared(
      Seq((1L, doc(0, 0))).toDF("doc_id", "text"))
    MinHashIncremental.writeBandIndex(prep, dir, nBuckets = 4)
    // the probe surface lands under the VERSIONED sub-path: a future
    // kernel bump makes this artifact invisible to readBandIndex, so a
    // stale-signature index rebuilds instead of silently matching nothing
    assert(new java.io.File(s"$dir/bands_$kv").exists)
    assert(!new java.io.File(s"$dir/bands").exists)
    val (bands, _) = MinHashIncremental.readBandIndex(spark, dir)
    assert(bands.select("doc_id").distinct().count() === 1)
    // legacy fallback: an unversioned pre-r15 artifact (same constants)
    val legacy = tmpDir("bandidx-legacy")
    MinHashIncremental.bandRows(prep)
      .withColumn("bucket", pmod(col("sig"), lit(4)).cast("int"))
      .write.partitionBy("bucket").parquet(s"$legacy/bands")
    prep.select(col("doc_id"), col("hset"))
      .withColumn("bucket", pmod(xxhash64(col("doc_id")), lit(4)).cast("int"))
      .write.partitionBy("bucket").parquet(s"$legacy/sets")
    val (lb, _) = MinHashIncremental.readBandIndex(spark, legacy)
    assert(lb.select("doc_id").distinct().count() === 1)
  }

  test("appending to a pre-r15 unversioned index folds it in: the legacy corpus keeps dropping near-dups (r16)") {
    import spark.implicits._
    val kv = graft.plans.MinHashSignatureExpr.KernelVersion
    val dir = tmpDir("bandidx-migrate")
    // a pre-r15 index: band rows under UNVERSIONED $dir/bands, holding doc 1
    val legacyPrep = MinHashIncremental.prepared(
      Seq((1L, doc(0, 0))).toDF("doc_id", "text"))
    MinHashIncremental.bandRows(legacyPrep)
      .withColumn("bucket", pmod(col("sig"), lit(4)).cast("int"))
      .write.partitionBy("bucket").parquet(s"$dir/bands")
    legacyPrep.select(col("doc_id"), col("hset"))
      .withColumn("bucket", pmod(xxhash64(col("doc_id")), lit(4)).cast("int"))
      .write.partitionBy("bucket").parquet(s"$dir/sets")
    // first versioned APPEND (a step with a distinct-family batch): the
    // hazard was that this wrote bands_<kv> while the legacy rows stayed
    // behind in $dir/bands, invisible to every later read
    val s1 = MinHashIncremental.step(spark,
      Seq((10L, doc(1, 0))).toDF("doc_id", "text"), dir, nBuckets = 4)
    assert(s1.select("doc_id").as[Long].collect().toSeq === Seq(10L))
    // the legacy layout is gone, folded into the versioned sub-path
    assert(!new java.io.File(s"$dir/bands").exists, "legacy dir migrated away")
    assert(new java.io.File(s"$dir/bands_$kv").exists)
    val (bands, sets) = MinHashIncremental.readBandIndex(spark, dir)
    assert(bands.select("doc_id").distinct().count() === 2, "both corpora probe-able")
    assert(sets.select("doc_id").distinct().count() === 2)
    // the acid test: a near-dup of the LEGACY corpus's doc 1 must still
    // die — before the fix its band rows had vanished and this leaked
    val s2 = MinHashIncremental.step(spark,
      Seq((20L, doc(0, 2)), (21L, doc(2, 0))).toDF("doc_id", "text"),
      dir, nBuckets = 4)
    assert(s2.select("doc_id").as[Long].collect().toSeq === Seq(21L))
  }

  test("both layouts coexisting on a read-only index probe as their union (r16)") {
    import spark.implicits._
    val dir = tmpDir("bandidx-union")
    // versioned half holds doc 1 (family 0); legacy half holds doc 2
    // (family 1) — e.g. an index touched by the pre-fix append bug, now
    // mounted read-only: reads must see BOTH probe surfaces
    val p1 = MinHashIncremental.prepared(Seq((1L, doc(0, 0))).toDF("doc_id", "text"))
    MinHashIncremental.writeBandIndex(p1, dir, nBuckets = 4)
    val p2 = MinHashIncremental.prepared(Seq((2L, doc(1, 0))).toDF("doc_id", "text"))
    MinHashIncremental.bandRows(p2)
      .withColumn("bucket", pmod(col("sig"), lit(4)).cast("int"))
      .write.partitionBy("bucket").parquet(s"$dir/bands")
    p2.select(col("doc_id"), col("hset"))
      .withColumn("bucket", pmod(xxhash64(col("doc_id")), lit(4)).cast("int"))
      .write.mode("append").partitionBy("bucket").parquet(s"$dir/sets")
    val (bands, sets) = MinHashIncremental.readBandIndex(spark, dir)
    assert(bands.select("doc_id").distinct().count() === 2)
    // near-dups of EACH half's doc must both drop, without any append
    val batch = Seq((10L, doc(0, 3)), (11L, doc(1, 3)), (12L, doc(3, 0)))
      .toDF("doc_id", "text")
    val got = MinHashIncremental.dedupNearAgainst(batch, bands, sets)
      .select("doc_id").as[Long].collect().sorted
    assert(got === Array(12L))
  }

  test("declared key matches a recomputed brute-force parity oracle at sf0.001") {
    import spark.implicits._
    val got = MinHashIncremental.dedupMinhashIncremental(spark, sf0001)
      .select("doc_id").as[Long].collect().sorted
    // independent recomputation: brute-force exact Jaccard over string
    // shingles (no minhash, no banding, no hashing of shingles)
    val sh = MinHashDedup.shingleDocs(spark, sf0001).persist()
    val pairs = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("jac",
        size(array_intersect(col("a.shingles"), col("b.shingles"))).cast("double")
          / size(array_union(col("a.shingles"), col("b.shingles"))))
      .filter(col("jac") >= MinHashDedup.threshold)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .persist()
    val docs = graft.Tables.documents(spark, sf0001).select("doc_id")
    val inDrop = pairs.filter(col("doc_a") % 2 === 1)
      .select(col("doc_b").as("doc_id"))
    val crossDrop = pairs.filter(col("doc_b") % 2 === 0)
      .select(col("doc_a").as("doc_id"))
      .union(pairs.filter(col("doc_a") % 2 === 0)
        .select(col("doc_b").as("doc_id")))
    val want = docs.filter(col("doc_id") % 2 === 1)
      .join(inDrop.union(crossDrop).distinct(), Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long].collect().sorted
    sh.unpersist(); pairs.unpersist()
    assert(got === want)
    assert(got.nonEmpty, "fixture must exercise the surviving path")
  }
}
