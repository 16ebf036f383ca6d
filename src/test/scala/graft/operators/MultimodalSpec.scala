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

  test("decodeDims parses crafted PNG headers (incl. edge dimensions)") {
    import Multimodal.MediaDecoder._
    assert(decodeDims(pngHeader(1, 1) ++ Array.fill[Byte](32)(9)) === Some(("png", 1, 1)))
    assert(decodeDims(pngHeader(65535, 3)) === Some(("png", 65535, 3)))
    assert(decodeDims(pngHeader(640, 480).dropRight(4)) === Some(("png", 640, 480)),
      "CRC bytes are not required to read IHDR dims")
  }

  test("decodeDims walks JPEG segments to SOF (APP0 + COM skipped by length)") {
    import Multimodal.MediaDecoder._
    assert(decodeDims(jpegHeader(320, 200) ++ Array.fill[Byte](16)(0x5a)) ===
      Some(("jpeg", 320, 200)))
    // progressive JPEG: same walk, SOF2 marker instead of SOF0
    val prog = jpegHeader(100, 50)
    val sofAt = prog.length - 19
    assert((prog(sofAt) & 0xff) === 0xff && (prog(sofAt + 1) & 0xff) === 0xc0)
    prog(sofAt + 1) = 0xc2.toByte
    assert(decodeDims(prog) === Some(("jpeg", 100, 50)))
  }

  test("decodeDims rejects junk, truncation, and corrupt markers") {
    import Multimodal.MediaDecoder._
    assert(decodeDims(Array.empty[Byte]) === None)
    assert(decodeDims(Array.fill[Byte](100)(42)) === None)
    assert(decodeDims(pngHeader(8, 8).take(15)) === None, "truncated before IHDR dims")
    val jfifOnly = jpegHeader(9, 9).take(20) // SOI + APP0, stream ends before SOF
    assert(decodeDims(jfifOnly) === None)
    val badSync = jpegHeader(9, 9)
    badSync(2) = 0x00 // APP0 marker loses its FF prefix
    assert(decodeDims(badSync) === None)
  }

  test("decodeDims never throws: fuzz over random bytes and mutated real headers") {
    import Multimodal.MediaDecoder._
    val rnd = new scala.util.Random(0xF00D)
    for (_ <- 0 until 2000) {
      val b = Array.fill[Byte](rnd.nextInt(200))(rnd.nextInt(256).toByte)
      decodeDims(b) // any Option is fine; an exception fails the test
    }
    for (_ <- 0 until 2000) {
      val h = if (rnd.nextBoolean()) pngHeader(640, 480) else jpegHeader(640, 480)
      val cut = h.take(rnd.nextInt(h.length + 1))
      if (cut.nonEmpty) cut(rnd.nextInt(cut.length)) = rnd.nextInt(256).toByte
      decodeDims(cut)
    }
  }

  test("media_dims: byte-parsed dims equal recorded metadata on every image row") {
    val rows = media.collect()
    rows.foreach { r =>
      val parsed = Multimodal.MediaDecoder.decodeDims(r.payload)
      if (r.meta.modality == "image")
        assert(parsed === Some((r.meta.format, r.meta.width, r.meta.height)),
          s"image row ${r.media_id}")
      else assert(parsed === None, s"non-image row ${r.media_id} must not decode")
    }
    assert(rows.count(_.meta.format == "png") > 0)
    assert(rows.count(_.meta.format == "jpeg") > 0)
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
