package graft.operators

import graft.SparkSpec

/** Multimodal column plumbing (SURVEY.md §2.7 E4): binary payload + typed
  * metadata, partition-batched decode, metadata-only stats, sampling,
  * payload dedup. The decoder is a deterministic stub; the assertions
  * cover the Spark plumbing a real codec would drop into. */
class MultimodalSpec extends SparkSpec {

  lazy val media = Multimodal.syntheticMedia(spark, 300)

  test("feature extraction is deterministic, fixed-dim, payload-free") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.length === 300)
    assert(f1.forall(_.features.length === Multimodal.MediaDecoder.dim))
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.checksum === b.checksum)
      assert(a.features.toSeq === b.features.toSeq)
    }
    // schema of the downstream dataset carries no payload column
    assert(!Multimodal.extractFeatures(media).schema.fieldNames.contains("payload"))
  }

  test("metadata-only stats cover all modalities") {
    val rows = Multimodal.mediaStats(media).collect()
    assert(rows.map(_.getAs[String]("modality")).toSeq === Seq("audio", "image", "video"))
    assert(rows.map(_.getAs[Long]("n")).sum === 300L)
  }

  test("systematic sampling keeps exactly every k-th row") {
    val sampled = Multimodal.sampleEveryK(media, 10).collect()
    assert(sampled.length === 30)
    assert(sampled.forall(_.media_id % 10 === 0))
  }

  test("payload dedup collapses identical payloads only") {
    import spark.implicits._
    val base = Multimodal.syntheticMedia(spark, 50)
    // duplicate payloads under new ids
    val dup = base.map(r => r.copy(media_id = r.media_id + 1000))
    val all = base.union(dup)
    val kept = Multimodal.payloadDedup(Multimodal.extractFeatures(all)).collect()
    assert(kept.length === 50, "every payload has exactly one duplicate partner")
    assert(kept.forall(_.getAs[Long]("media_id") < 1000), "row_number keeps the lowest id")
  }
}
