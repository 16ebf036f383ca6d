package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental perceptual near-dup against a persisted band index — the
  * declared key is oracle-gated over the planted fixture's parity split;
  * these specs pin the batch semantics (in-batch keep-first over VERIFIED
  * pairs, index probe + exact-Hamming verify, index append, non-image
  * survival) on crafted corpora with hand-checkable ground truth. */
class PhashIncrementalSpec extends SparkSpec {

  /** A PNG of [[ImagePhash.basePixels]] for pixel-family `k`; `variant`
    * re-encodes the SAME pixels with different filter/level choices (the
    * fixture's exact-twin construction — different bytes, same dHash). */
  private def img(k: Long, variant: Int = 0): Array[Byte] = {
    val (w, h, px) = ImagePhash.basePixels(k)
    if (variant == 0) ImagePhash.Png.encode(w, h, px, filterFor = r => ((k + r) % 5).toInt)
    else ImagePhash.Png.encode(w, h, px,
      filterFor = r => ((r * 2 + variant) % 5).toInt, level = 9, idatChunk = 512)
  }

  test("dedupAgainst: in-batch twin keeps lowest id; index twin dies; fresh and non-image payloads survive") {
    import spark.implicits._
    val idxHashes = ImagePhash.phashFrame(
      Seq((2L, img(0))).toDF("media_id", "payload"))
    val batch = Seq(
      (10L, img(0, 1)),            // re-encode of index image 2 → dropped
      (11L, img(1)),               // fresh pixel family → kept
      (12L, img(1, 2)),            // in-batch re-encode of 11 → dropped
      (13L, img(2)),               // fresh → kept
      (14L, "not an image".getBytes)) // undecodable: must SURVIVE
      .toDF("media_id", "payload")
    val got = PhashIncremental.dedupAgainst(batch,
        PhashIncremental.bandRows(idxHashes), idxHashes)
      .select("media_id").as[Long].collect().sorted
    assert(got === Array(11L, 13L, 14L))
  }

  test("step: survivors append so the next batch near-dedups against them") {
    import spark.implicits._
    val dir = tmpDir("phashidx")
    PhashIncremental.writePhashIndex(
      ImagePhash.phashFrame(Seq((1L, img(0))).toDF("media_id", "payload")),
      dir, nBuckets = 4)
    val s1 = PhashIncremental.step(spark,
      Seq((10L, img(1)), (11L, img(0, 1))).toDF("media_id", "payload"),
      dir, nBuckets = 4)
    assert(s1.select("media_id").as[Long].collect().toSeq === Seq(10L))
    // batch 2: 20 re-encodes batch 1's SURVIVOR → must die against the
    // appended index, not just the seed
    val s2 = PhashIncremental.step(spark,
      Seq((20L, img(1, 3)), (21L, img(3))).toDF("media_id", "payload"),
      dir, nBuckets = 4)
    assert(s2.select("media_id").as[Long].collect().toSeq === Seq(21L))
    val (bands, hashes) = PhashIncremental.readPhashIndex(spark, dir)
    assert(hashes.select("media_id").distinct().count() === 3)
    assert(bands.select("media_id").distinct().count() === 3)
    assert(bands.count() === 3L * ImagePhash.Bands)
    assert(bands.columns.toSet === Set("media_id", "b", "v", "bucket"))
    assert(hashes.columns.toSet === Set("media_id", "phash", "bucket"))
  }

  test("verification is exact: a band collision past the Hamming radius is not dropped") {
    import spark.implicits._
    // two hashes agreeing on band 0 (a guaranteed banded candidate) but
    // Hamming 4 > HammingMax = 3 apart — the verify stage must keep both
    val h2 = (1L << 16) | (1L << 17) | (1L << 32) | (1L << 48)
    val batchHashes = Seq((1L, 0L), (2L, h2)).toDF("media_id", "phash")
    val empty = batchHashes.filter(lit(false))
    val drops = PhashIncremental.nearDupDrops(batchHashes,
      PhashIncremental.bandRows(empty), empty)
    assert(drops.count() === 0)
    // control: Hamming 3 on the same construction IS dropped
    val h3 = (1L << 16) | (1L << 32) | (1L << 48)
    val near = Seq((1L, 0L), (2L, h3)).toDF("media_id", "phash")
    assert(PhashIncremental.nearDupDrops(near,
      PhashIncremental.bandRows(empty), empty)
      .as[Long].collect().toSeq === Seq(2L))
  }

  test("the index is fingerprint-generic: audio hashes ride the same machinery") {
    import spark.implicits._
    // AudioPhash.audioPhashFrame emits the same (media_id, 64-bit phash)
    // shape — the incremental index takes it unchanged, as the batch
    // phashDedup and the streaming bucket state do
    def wav(samples: Array[Short]) = Wav.encode(AudioPhash.SampleRate, samples)
    val idxHashes = AudioPhash.audioPhashFrame(
      Seq((1L, wav(AudioPhash.gridCodeSamples(5L)))).toDF("media_id", "payload"))
    val batch = AudioPhash.audioPhashFrame(Seq(
      (10L, wav(AudioPhash.scaleTwin(AudioPhash.gridCodeSamples(5L)))), // gain twin of index clip
      (11L, wav(AudioPhash.gridCodeSamples(6L))))                       // fresh clip
      .toDF("media_id", "payload"))
    val drops = PhashIncremental.nearDupDrops(batch,
      PhashIncremental.bandRows(idxHashes), idxHashes)
    assert(drops.as[Long].collect().toSeq === Seq(10L))
  }

  test("audio declared key matches the planted parity ground truth at fixture scale") {
    import spark.implicits._
    AudioPhash.ensureAudioPhashFixture(spark)
    val got = PhashIncremental.audioPhashIncremental(spark, "unused")
      .as[Long].collect().toSeq
    val want = spark.read.parquet(AudioPhash.audioFixturePath)
      .filter(col("kind") === "base" && col("media_id") % 2 === 1)
      .select("media_id").as[Long].collect().sorted.toSeq
    assert(want.size === AudioPhash.NBaseAudio / 2)
    assert(got === want)
  }

  test("declared key matches the planted parity ground truth at fixture scale") {
    import spark.implicits._
    ImagePhash.ensurePhashFixture(spark)
    val got = PhashIncremental.mediaPhashIncremental(spark, "unused")
      .as[Long].collect().toSeq
    val want = spark.read.parquet(ImagePhash.fixturePath)
      .filter(col("kind") === "base" && col("media_id") % 2 === 1)
      .select("media_id").as[Long].collect().sorted.toSeq
    assert(want.size === ImagePhash.NBase / 2)
    assert(got === want)
  }
}
