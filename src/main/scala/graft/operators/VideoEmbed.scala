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
  * → exact-cosine verify) unchanged, and the persisted IVFADC serving
  * path unchanged too ([[videoAnnQuery]], declared key `video_ann` —
  * with `media_ann`/`audio_ann`, every embedded modality is also
  * ANN-served, completing the modality × pathway matrix).
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
    * independent draws, concentrating well below the floor; measured:
    * twin min ≈ 0.9993 vs distinct max ≈ 0.45 around 0.985). */
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
      var ok = true
      while (ok && j < VideoPhash.Slots) {
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
            j += 1
          case None => ok = false
        }
      }
      if (ok) Some(out) else None
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

  // ---------------------------------------- persisted ANN serving path

  /** Serving location for the video-embedding IVFADC index — the
    * [[ImageEmbed.mediaAnnIndexPath]] staleness discipline keyed on the
    * video FIXTURE's files. */
  def videoAnnIndexPath: String =
    "target/fixtures/video_ivfpq_" +
      graft.Tables.pathFingerprint(VideoPhash.videoFixturePath)

  /** IVF centroid count / PQ subspaces for the video index: [[Dim]]=160
    * dims → 4 subspaces of 40 dims; 8 inverted lists over the 200-base
    * corpus (the `media_ann`/`audio_ann` fixture ratios). */
  val AnnClusters = 8
  val AnnSubspaces = 4

  /** Declared key (`video_ann`): "find near-dups of this video across
    * the corpus" — video embeddings through the PERSISTED IVFADC serving
    * path, end to end, closing the modality × pathway matrix outright
    * ([[ImageEmbed.mediaAnnQuery]]'s shape over the video fixture). The
    * 200 base videos' descriptors are built into an IVF(+PQ) index at
    * most once (completion-marker-gated; every later call SERVES,
    * repeat-call bit-identical); the 200 planted twins (q70 requal,
    * half-frame-rate, +12 brightness, re-containered MP4) are the query
    * batch, probed + ADC-shortlisted + exact-reranked. Output: one row
    * per twin with its top-1 base — row-equal to the planted twin_of,
    * i.e. the video column demonstrably rides the whole vector-serving
    * stack: nProbe/c of the index read per query, codes before floats,
    * floats only for the shortlist. */
  def videoAnnQuery(spark: SparkSession, dir: String): DataFrame = {
    VideoPhash.ensureVideoPhashFixture(spark)
    val fix = spark.read.parquet(VideoPhash.videoFixturePath)
    val idxPath = videoAnnIndexPath
    // double-checked synchronized build gate (the ensureBm25Index
    // discipline): two threads racing the first call must not interleave
    // writes under the same index path
    if (!graft.Tables.artifactComplete(idxPath)) synchronized {
      if (!graft.Tables.artifactComplete(idxPath)) {
        val baseEmb = ProductQuant.normalized(
          videoEmbedFrame(fix.filter(col("kind") === "base")
              .select("media_id", "payload"))
            .withColumnRenamed("media_id", "vec_id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        ProductQuant.writeIvfPqIndex(spark, idxPath, baseEmb,
          c = AnnClusters, m = AnnSubspaces)
        baseEmb.unpersist(blocking = false)
        graft.Tables.markArtifactComplete(idxPath)
      }
    }
    val (assigned, centroids, cbs) = ProductQuant.readIvfPqIndex(spark, idxPath)
    val queries = ProductQuant.normalized(
      videoEmbedFrame(fix.filter(col("kind") =!= "base")
          .select("media_id", "payload"))
        .withColumnRenamed("media_id", "vec_id"))
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    ProductQuant.ivfPqSearch(assigned, assigned.select("vec_id", "v"),
        queries, centroids, cbs, k = 1, nProbe = 2)
      .select(col("q_id").as("media_id"), col("vec_id").as("found_base"))
      .orderBy("media_id")
  }
}
