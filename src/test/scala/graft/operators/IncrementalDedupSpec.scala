package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental dedup against a persisted fingerprint index: the
  * declared key is oracle-gated at sf0.01; these specs pin the batch
  * semantics (in-batch keep-first, index anti-join, index append) on
  * crafted corpora where ground truth is hand-checkable. */
class IncrementalDedupSpec extends SparkSpec {

  test("dedupAgainst: in-batch dup keeps lowest id; index member dies; fresh survives") {
    import spark.implicits._
    val index = IncrementalDedup.fingerprints(
      Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text"))
      .select("fp")
    val batch = Seq(
      (10L, "alpha beta"),        // already in index → dropped
      (11L, "epsilon zeta"),      // fresh → kept
      (12L, "epsilon zeta"),      // in-batch dup of 11 → dropped
      (13L, "beta alpha alpha"))  // bag-of-words equal to doc 1 → dropped
      .toDF("doc_id", "text")
    val got = IncrementalDedup.dedupAgainst(batch, index)
      .select("doc_id").as[Long].collect().sorted
    assert(got === Array(11L))
  }

  test("step: survivors append to the index so the next batch dedups against them") {
    import spark.implicits._
    val dir = tmpDir("fpidx")
    IncrementalDedup.writeFpIndex(
      IncrementalDedup.fingerprints(
        Seq((1L, "one two")).toDF("doc_id", "text")).select("fp"),
      dir, nBuckets = 4)
    val s1 = IncrementalDedup.step(spark,
      Seq((10L, "three four"), (11L, "one two")).toDF("doc_id", "text"),
      dir, nBuckets = 4)
    assert(s1.select("doc_id").as[Long].collect().toSeq === Seq(10L))
    // batch 2: doc 20 repeats batch 1's survivor → must die against the
    // APPENDED index, not just the original
    val s2 = IncrementalDedup.step(spark,
      Seq((20L, "three four"), (21L, "five six")).toDF("doc_id", "text"),
      dir, nBuckets = 4)
    assert(s2.select("doc_id").as[Long].collect().toSeq === Seq(21L))
    // index now holds the three distinct fingerprints (initial "one two"
    // plus the two batch survivors), bucket column intact
    val idx = IncrementalDedup.readFpIndex(spark, dir)
    assert(idx.select("fp").distinct().count() === 3)
    assert(idx.columns.toSet === Set("fp", "bucket"))
  }

  test("index bucketing is deterministic: same fp lands in the same bucket partition") {
    import spark.implicits._
    val dir = tmpDir("fpidx-buckets")
    val fps = IncrementalDedup.fingerprints(
      (0L until 50L).map(i => (i, s"tok$i payload")).toDF("doc_id", "text"))
      .select("fp")
    IncrementalDedup.writeFpIndex(fps, dir, nBuckets = 8)
    IncrementalDedup.writeFpIndex(fps, dir, nBuckets = 8, append = true)
    // every fp occurs exactly twice and in exactly one bucket
    val byFp = IncrementalDedup.readFpIndex(spark, dir)
      .groupBy("fp").agg(count(lit(1)).as("n"),
        countDistinct(col("bucket")).as("nb"))
    assert(byFp.filter(col("n") =!= 2 || col("nb") =!= 1).count() === 0)
  }

  test("declared key matches a recomputed parity-split oracle at sf0.001") {
    import spark.implicits._
    val got = IncrementalDedup.dedupIncremental(spark, sf0001)
    // recompute with independent frame logic: full-corpus fingerprints,
    // survivors = odd docs that are the min odd id for their fp AND whose
    // fp has no even-doc occurrence
    val f = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
    val evenFps = f.filter(col("doc_id") % 2 === 0).select("fp").distinct()
    val minOdd = f.filter(col("doc_id") % 2 === 1)
      .groupBy("fp").agg(min("doc_id").as("doc_id"))
    val want = minOdd.join(evenFps, Seq("fp"), "left_anti")
      .select("doc_id").as[Long].collect().sorted
    assert(got.select("doc_id").as[Long].collect().sorted === want)
    assert(want.nonEmpty, "fixture must exercise the surviving path")
  }
}
