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

  /** Reference LEARNED extractor — the ONNX serving shape end to end
    * (the r19 stretch): a fixed-weight two-layer network over decoded
    * pixels, with the weight tensors materialized lazily ONCE PER JVM
    * on first use (the documented pattern: the instance ships to
    * executors inside the task closure, and the `lazy val` initializes
    * exactly where an ONNX session would — inside the executor, once,
    * never per row). The weights are synthesized from a fixed seed
    * (standing in for a weight-file read; the container carries no
    * inference runtime), but every serving property the hook must
    * carry is real: per-JVM lazy model init, per-row inference inside
    * the partition iterator, deterministic output, modality routing by
    * decodability, and the unchanged near-dup/ANN stack downstream —
    * twin recovery on the planted fixture is spec-pinned.
    *
    * Architecture: payload → pixels → 8×8 block-mean luma grid,
    * mean-centered (DC removed, the [[ImageEmbed.colorLayout]]
    * discipline — distinct images decorrelate) → 64→[[Hidden]] linear
    * + tanh (pre-activations scaled into tanh's near-linear region so
    * a twin's sub-LSB pixel jitter cannot flip saturated signs) →
    * [[Hidden]]→[[OutDim]] linear. Cosine-comparable by construction;
    * downstream normalization is the consumer's, as for every
    * extractor. */
  object LearnedImageExtractor extends MediaExtractor {
    val Hidden = 32
    val OutDim = 24
    // "model load": deterministic tensor synthesis from a fixed seed,
    // once per JVM (lazy) — the ONNX-session init point
    private lazy val model: (Array[Double], Array[Double]) = {
      def tensor(n: Int, seed: Long, scale: Double) =
        Array.tabulate(n)(i => scale *
          ((ImagePhash.splitmix64(seed + i) >>> 11).toDouble / (1L << 52) - 1.0))
      (tensor(64 * Hidden, 0x17ee4ab1L, 1.0 / 64),
        tensor(Hidden * OutDim, 0x5ca1ab1eL, 1.0 / math.sqrt(Hidden)))
    }
    def extract(payload: Array[Byte]): Option[Array[Double]] =
      ImagePhash.decodeImage(payload).map { case (w, h, px) =>
        val (w1, w2) = model
        // 8×8 block-mean luma grid (integer thousandths — bit-stable)
        val g = new Array[Double](64)
        var gy = 0
        while (gy < 8) {
          val y0 = gy * h / 8; val y1 = (gy + 1) * h / 8
          var gx = 0
          while (gx < 8) {
            val x0 = gx * w / 8; val x1 = (gx + 1) * w / 8
            var sum = 0L; var n = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val i = (y * w + x) * 3
                sum += 299L * (px(i) & 0xff) + 587L * (px(i + 1) & 0xff) +
                  114L * (px(i + 2) & 0xff)
                n += 1
                x += 1
              }
              y += 1
            }
            g(gy * 8 + gx) = if (n == 0) 0.0 else (sum / n) / 1000.0
            gx += 1
          }
          gy += 1
        }
        val mean = g.sum / 64
        var i = 0
        while (i < 64) { g(i) -= mean; i += 1 }
        val hid = new Array[Double](Hidden)
        var j = 0
        while (j < Hidden) {
          var s = 0.0
          var k = 0
          while (k < 64) { s += g(k) * w1(k * Hidden + j); k += 1 }
          hid(j) = math.tanh(s)
          j += 1
        }
        val out = new Array[Double](OutDim)
        var o = 0
        while (o < OutDim) {
          var s = 0.0
          var k = 0
          while (k < Hidden) { s += hid(k) * w2(k * OutDim + o); k += 1 }
          out(o) = s
          o += 1
        }
        out
      }
  }
}
