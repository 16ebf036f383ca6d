package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Video → embedding: real CONTENT features from decoded frames
  * (SURVEY.md §2.7 E4 — completes the modality × pathway matrix: image,
  * audio, and video each have BOTH a perceptual fingerprint and a
  * vector-stack embedding; reference scope `flink-samples` has no media
  * operators, cited per SURVEY §2.7).
  *
  * The descriptor is the temporal concatenation of per-frame spectral
  * shapes: [[VideoPhash.sampleIndices]] picks [[VideoPhash.Slots]]
  * frames at fixed NORMALIZED times (so any encoding of the same
  * content — other frame rate, other container — samples the same
  * content instants), each sampled frame contributes its
  * [[ImageEmbed.colorLayout]] luma AC spectrum, and each slot's block
  * is L2-normalized before concatenation. Per-slot normalization makes
  * the video cosine the MEAN of per-frame cosines — one high-contrast
  * scene cannot dominate the clip's identity, and each slot inherits
  * the image descriptor's invariances (re-quantization, brightness
  * shift = DC only, cross-codec) verbatim.
  *
  * Downstream the vector rides the engine's ONE vector stack
  * ([[ImageEmbed.embedNearDup]]: two-table simhash LSH → banded Hamming
  * → exact-cosine verify) unchanged, and WOULD ride the persisted
  * IVFADC serving path unchanged too (160 dims = 8 or 4 PQ subspaces;
  * `media_ann`/`audio_ann` already certify that path is modality-blind,
  * so the serving key is not triplicated).
  *
  * Scale: decode+descriptor is one narrow mapPartitions pass (8 JPEG
  * frame decodes per video, the [[VideoPhash.videoPhashFrame]] cost
  * shape); only (media_id, 160 doubles ≈ 1.3 KB) leaves it — never
  * frames — regardless of video length.
  */
object VideoEmbed {

  /** Descriptor length: [[VideoPhash.Slots]] × [[ImageEmbed.NCoef]]. */
  val Dim: Int = VideoPhash.Slots * ImageEmbed.NCoef

  /** Cosine floor for the verify stage — fixture margins measured in
    * VideoEmbedSpec (per-slot normalization tightens both sides: twins
    * average 8 near-1 slot cosines, distinct videos average 8
    * independent draws, concentrating well below the floor). */
  val CosThreshold = 0.985

  /** Decode + descriptor: per-slot-normalized concatenated color-layout
    * spectra. None if the container or ANY sampled frame fails to decode
    * (a partial descriptor would verify against nothing — the
    * [[VideoPhash.videoPhash]] contract). */
  def videoEmbed(payload: Array[Byte]): Option[Array[Double]] = {
    VideoPhash.decodeVideo(payload).flatMap { v =>
      val out = new Array[Double](Dim)
      val idx = VideoPhash.sampleIndices(v.frames.length)
      var j = 0
      while (j < VideoPhash.Slots) {
        ImagePhash.decodeImage(v.frames(idx(j))) match {
          case Some((w, h, px)) =>
            val block = ImageEmbed.colorLayout(w, h, px)
            var n2 = 0.0
            var k = 0
            while (k < block.length) { n2 += block(k) * block(k); k += 1 }
            val inv = if (n2 > 0) 1.0 / math.sqrt(n2) else 0.0
            k = 0
            while (k < block.length) {
              out(j * ImageEmbed.NCoef + k) = block(k) * inv; k += 1
            }
          case None => return None
        }
        j += 1
      }
      Some(out)
    }
  }

  /** Decode + descriptor as one narrow pass — non-video payloads drop
    * out, so the frame is safe over a mixed-modality corpus. */
  def videoEmbedFrame(videos: DataFrame): DataFrame = {
    import videos.sparkSession.implicits._
    videos.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        videoEmbed(payload).map(v => (id, v))
      })
      .toDF("media_id", "v")
  }

  /** Declared key (`video_embed`): frames → embedding → vector-stack
    * near-dup over the SAME planted fixture as `video_phash` — row
    * equality vs the planted ground truth certifies a SECOND,
    * independent video content pathway (spectral shape + cosine, not
    * gradient signs + slot-majority Hamming; the two share only the
    * container walk and pixel decode). The q70-requal, HALF-FRAME-RATE,
    * brightness, and RE-CONTAINERED MP4 twins must all land on their
    * bases with zero false pairs among the distinct videos, through
    * [[ImageEmbed.embedNearDup]] verbatim. */
  def videoEmbedQuery(spark: SparkSession, dir: String): DataFrame = {
    VideoPhash.ensureVideoPhashFixture(spark)
    ImageEmbed.embedNearDup(
        videoEmbedFrame(spark.read.parquet(VideoPhash.videoFixturePath)
          .select("media_id", "payload")),
        threshold = CosThreshold)
      .orderBy("media_id")
  }
}
