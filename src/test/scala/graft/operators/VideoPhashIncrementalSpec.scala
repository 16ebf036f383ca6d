package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental video near-dup against a persisted (slot, band) index —
  * the declared key is oracle-gated over the video fixture's parity
  * split; these specs pin the batch semantics and the slot-majority
  * verify on crafted corpora with hand-checkable ground truth. */
class VideoPhashIncrementalSpec extends SparkSpec {

  test("dedupAgainst: in-batch twin keeps lowest id; index twin dies; fresh and non-video payloads survive") {
    import spark.implicits._
    val idxHashes = VideoPhash.videoPhashFrame(
      Seq((2L, VideoPhash.baseVideo(0))).toDF("media_id", "payload"))
    val batch = Seq(
      (10L, VideoPhash.requalTwin(0)),   // q70 twin of index video 2 → dropped
      (11L, VideoPhash.baseVideo(1)),    // fresh → kept
      (12L, VideoPhash.mp4Twin(1)),      // in-batch re-containered twin of 11 → dropped
      (13L, VideoPhash.baseVideo(2)),    // fresh → kept
      (14L, "not a video".getBytes))     // undecodable: must SURVIVE
      .toDF("media_id", "payload")
    val got = VideoPhashIncremental.dedupAgainst(batch,
        VideoPhashIncremental.bandRows(idxHashes), idxHashes)
      .select("media_id").as[Long].collect().sorted
    assert(got === Array(11L, 13L, 14L))
  }

  test("step: survivors append so the next batch near-dedups against them") {
    import spark.implicits._
    val dir = tmpDir("vphashidx")
    VideoPhashIncremental.writeVideoIndex(
      VideoPhash.videoPhashFrame(
        Seq((1L, VideoPhash.baseVideo(0))).toDF("media_id", "payload")),
      dir, nBuckets = 4)
    val s1 = VideoPhashIncremental.step(spark,
      Seq((10L, VideoPhash.baseVideo(1)), (11L, VideoPhash.fpsTwin(0)))
        .toDF("media_id", "payload"),
      dir, nBuckets = 4)
    assert(s1.select("media_id").as[Long].collect().toSeq === Seq(10L))
    // batch 2: 20 is a brightness twin of batch 1's SURVIVOR → must die
    // against the appended index, not just the seed
    val s2 = VideoPhashIncremental.step(spark,
      Seq((20L, VideoPhash.brightTwin(1)), (21L, VideoPhash.baseVideo(3)))
        .toDF("media_id", "payload"),
      dir, nBuckets = 4)
    assert(s2.select("media_id").as[Long].collect().toSeq === Seq(21L))
    val (bands, hashes) = VideoPhashIncremental.readVideoIndex(spark, dir)
    assert(hashes.select("media_id").distinct().count() === 3)
    assert(bands.count() ===
      3L * VideoPhash.Slots * ImagePhash.Bands, "32 band rows per video")
    assert(bands.columns.toSet === Set("media_id", "sb", "v", "bucket"))
    assert(hashes.columns.toSet === Set("media_id", "phashes", "bucket"))
  }

  test("verify is slot-majority: 5-of-8 matching slots is not a dup, 6-of-8 is") {
    import spark.implicits._
    // slot hashes crafted directly: `far` slots differ by 8 bits (> the
    // per-slot radius 3), matching slots are identical
    val far = 0xFFL
    def arr(matching: Int): Array[Long] =
      Array.tabulate(VideoPhash.Slots)(s => if (s < matching) 0L else far)
    val base = Array.fill(VideoPhash.Slots)(0L)
    val five = Seq((1L, base), (2L, arr(5))).toDF("media_id", "phashes")
    val empty = five.filter(lit(false))
    assert(VideoPhashIncremental.nearDupDrops(five,
      VideoPhashIncremental.bandRows(empty), empty).count() === 0,
      "5 matching slots must NOT pass the 6-of-8 majority")
    val six = Seq((1L, base), (2L, arr(6))).toDF("media_id", "phashes")
    assert(VideoPhashIncremental.nearDupDrops(six,
      VideoPhashIncremental.bandRows(empty), empty)
      .as[Long].collect().toSeq === Seq(2L))
  }

  test("declared key matches the planted parity ground truth at fixture scale") {
    import spark.implicits._
    VideoPhash.ensureVideoPhashFixture(spark)
    val got = VideoPhashIncremental.videoPhashIncremental(spark, "unused")
      .as[Long].collect().toSeq
    val want = spark.read.parquet(VideoPhash.videoFixturePath)
      .filter(col("kind") === "base" && col("media_id") % 2 === 1)
      .select("media_id").as[Long].collect().sorted.toSeq
    assert(want.size === VideoPhash.NBaseVideo / 2)
    assert(got === want)
  }
}
