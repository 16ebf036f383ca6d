package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pluggable content-embedding extraction (SURVEY.md §2.7 E4's
  * learned-feature hook — the one remaining, now optional, swap-in the
  * multimodal notes called out): a [[MediaExtractor]] maps payload
  * bytes to an optional dense vector, and [[MediaExtractor.embedFrame]]
  * is the ONE piece of Spark plumbing every extractor shares — the
  * narrow mapPartitions pass from (media_id, payload) to (media_id, v).
  *
  * Everything DOWNSTREAM of the vector is already extractor-blind: the
  * hyperplane-signature near-dup mining ([[ImageEmbed.embedNearDup]]),
  * the IVFADC build/serve/append/retract/retrain lifecycle
  * ([[ProductQuant]]), semantic dedup ([[SemDedup]]), and the unified
  * takedown all consume a (id, v) frame and never ask where v came
  * from. So a LEARNED extractor — an ONNX-style vision or audio model
  * scoring payload bytes inside the partition iterator — drops in by
  * implementing ONE method, with zero changes to the dedup/ANN
  * machinery; the two built-in instances ([[ImageExtractor]] — the
  * analytic MPEG-7-style color layout, [[AudioExtractor]] — the
  * Goertzel log-spectral profile) are the proof the interface carries a
  * real pathway end to end (the `media_embed`/`audio_embed` declared
  * keys run through it verbatim).
  *
  * Contract: deterministic (same payload → same vector — dedup
  * verdicts and the persisted-index lifecycle both rely on
  * reproducible vectors), `None` for payloads outside the extractor's
  * modality (mixed-modality corpora route rows by magic bytes, not by
  * error), and Serializable (the instance ships to executors inside
  * the task closure; a learned extractor holds its weights the same
  * way — loaded once per JVM in a lazy val, not per row).
  */
trait MediaExtractor extends Serializable {
  /** Payload bytes → dense vector, or None when the payload is not
    * this extractor's modality. */
  def extract(payload: Array[Byte]): Option[Array[Double]]
}

object MediaExtractor {

  /** The shared plumbing: (media_id, payload) → (media_id, v) through
    * `extractor`, one narrow mapPartitions pass (no shuffle; payloads
    * never leave the scan stage — the E4 pruning discipline). Rows the
    * extractor declines drop out, so the frame is safe over a
    * mixed-modality corpus. */
  def embedFrame(media: DataFrame, extractor: MediaExtractor): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        extractor.extract(payload).map(v => (id, v))
      })
      .toDF("media_id", "v")
  }

  /** Built-in image instance: magic-byte PNG/JPEG decode → luma
    * color-layout descriptor ([[ImageEmbed.colorLayout]]). */
  object ImageExtractor extends MediaExtractor {
    def extract(payload: Array[Byte]): Option[Array[Double]] =
      ImagePhash.decodeImage(payload).map { case (w, h, px) =>
        ImageEmbed.colorLayout(w, h, px)
      }
  }

  /** Built-in audio instance: WAV chunk-walk decode → mean-centered
    * Goertzel log-spectral band profile ([[AudioEmbed.bandProfile]]). */
  object AudioExtractor extends MediaExtractor {
    def extract(payload: Array[Byte]): Option[Array[Double]] =
      Wav.decode(payload).map { case (rate, samples) =>
        AudioEmbed.bandProfile(rate, samples)
      }
  }
}
