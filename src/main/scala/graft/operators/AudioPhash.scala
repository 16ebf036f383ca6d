package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Audio perceptual fingerprint + near-dup (SURVEY.md §2.7 E4 — the
  * audio modality's content level, as [[ImagePhash]] is the image
  * modality's; reference scope `flink-samples` has no media operators,
  * cited per SURVEY §2.7).
  *
  * The fingerprint is the Haitsma–Kalker shape (ISMIR 2002, "A Highly
  * Robust Audio Fingerprinting System", public literature): slice the
  * clip into time segments, measure log energy in log-spaced frequency
  * bands, and keep only the SIGNS of adjacent band-energy differences —
  * gain changes shift every log energy equally, dither adds incoherent
  * broadband noise, and resampling preserves band ratios, so the sign
  * pattern survives all three while distinct content scrambles it. An
  * 8-segment × 9-band grid under the adjacent-difference rule is exactly
  * [[ImagePhash.dHash]] on a spectrogram: 64 bits, banded-Hamming
  * dedup machinery shared verbatim ([[ImagePhash.phashDedup]]).
  *
  * Band energies come from Goertzel filters (the single-bin DFT
  * recurrence) at BIN-ALIGNED frequencies: every band frequency is an
  * integer multiple of rate/segmentLen, so each segment's sinusoids are
  * coherent over the analysis window and cross-band spectral leakage is
  * exactly zero for bandlimited content — the fixture's planted 6 dB
  * steps are then analytically unflippable by the twin transforms. (For
  * arbitrary real-world audio the bins are not aligned and leakage
  * shifts energies; but a near-dup pair suffers the SAME leakage on both
  * sides, so the differences still cancel — the published fingerprint's
  * robustness argument.)
  *
  * Scale: decode+fingerprint is a narrow mapPartitions pass (the
  * [[ImagePhash.phashFrame]] shape); only (media_id, 8 B hash) shuffles.
  */
object AudioPhash {

  /** Analysis layout: 8 time segments × 9 bands (→ 64 sign bits). */
  val Segments = 8
  val NBands = 9

  /** Band frequencies in Hz — log-spaced-ish, all multiples of 16 Hz
    * (= 8000/500 = 4000/250: bin-aligned at BOTH the fixture rate and
    * its half-rate resample), all ≤ 1760 < the 2000 Hz post-resample
    * Nyquist so decimation by 2 is alias-free on bandlimited content. */
  val BandHz: Array[Int] = Array(256, 352, 480, 624, 800, 1008, 1232, 1472, 1760)

  /** Goertzel power of frequency `hz` over samples [from, until).
    * (Shared with [[AudioEmbed]] — fingerprint and embedding run the
    * same band analysis, so their verdicts can never drift on decode.) */
  private[operators] def goertzel(samples: Array[Short], from: Int, until: Int,
      hz: Int, rate: Int): Double = {
    val w = 2.0 * math.Pi * hz / rate
    val coeff = 2.0 * math.cos(w)
    var s1 = 0.0; var s2 = 0.0
    var i = from
    while (i < until) {
      val s0 = samples(i) + coeff * s1 - s2
      s2 = s1; s1 = s0
      i += 1
    }
    s1 * s1 + s2 * s2 - coeff * s1 * s2
  }

  /** 64-bit spectral fingerprint: bit k = 8·seg + b set iff the log band
    * energy rises from band b to band b+1 in segment seg (the
    * [[ImagePhash.dHash]] convention on the time×frequency grid). */
  def audioPhash(rate: Int, samples: Array[Short]): Long = {
    val n = samples.length
    var hash = 0L
    var seg = 0
    while (seg < Segments) {
      val from = seg * n / Segments
      val until = (seg + 1) * n / Segments
      val g = new Array[Double](NBands)
      var b = 0
      while (b < NBands) {
        g(b) = math.log(goertzel(samples, from, until, BandHz(b), rate) + 1e-9)
        b += 1
      }
      b = 0
      while (b < NBands - 1) {
        if (g(b) < g(b + 1)) hash |= (1L << (8 * seg + b))
        b += 1
      }
      seg += 1
    }
    hash
  }

  // ------------------------------------------------------------ generator

  val SampleRate = 8000
  val NSamples = 4000 // 0.5 s → 8 segments of 500 samples (31.25 ms each)
  private val BaseAmp = 800.0

  /** Code-carrying clip: renders `splitmix64(id)` so that
    * [[audioPhash]] ≡ the code by construction — per segment, the band
    * amplitudes follow a ±6 dB walk whose step directions are the code
    * bits (the [[ImagePhash.gridCodePixels]] discipline in the log-energy
    * domain), centered to keep the summed waveform inside PCM16. Uniform
    * codes give birthday-bound separation at 100k-probe scale; the 6 dB
    * adjacent-band ratio is unflippable by the planted twin transforms
    * (gain shifts all bands equally; dither is ~55 dB below the weakest
    * band; decimation by 2 is alias-free — bands stop below the new
    * Nyquist). */
  def gridCodeSamples(id: Long): Array[Short] = {
    val code = ImagePhash.splitmix64(id)
    val out = new Array[Short](NSamples)
    val segLen = NSamples / Segments
    var seg = 0
    while (seg < Segments) {
      val walk = new Array[Int](NBands)
      var mn = 0; var mx = 0
      var b = 0
      while (b < NBands - 1) {
        walk(b + 1) = walk(b) + (if (((code >>> (8 * seg + b)) & 1L) == 1L) 1 else -1)
        mn = math.min(mn, walk(b + 1)); mx = math.max(mx, walk(b + 1))
        b += 1
      }
      val center = (mn + mx) / 2.0
      val amps = Array.tabulate(NBands)(b => BaseAmp * math.pow(2.0, walk(b) - center))
      var i = 0
      while (i < segLen) {
        var v = 0.0
        var bb = 0
        while (bb < NBands) {
          v += amps(bb) * math.sin(2.0 * math.Pi * BandHz(bb) * i / SampleRate)
          bb += 1
        }
        out(seg * segLen + i) = math.max(-32768, math.min(32767, math.round(v))).toShort
        i += 1
      }
      seg += 1
    }
    out
  }

  /** The planted twin transforms (each a REAL production degradation):
    * gain at 0.45×, ±50-LSB deterministic dither, decimation-by-2
    * resample. */
  def scaleTwin(s: Array[Short]): Array[Short] =
    s.map(v => math.round(v * 0.45).toShort)

  def ditherTwin(id: Long, s: Array[Short]): Array[Short] = {
    var st = ImagePhash.splitmix64(id) | 1L
    s.map { v =>
      st = st * 6364136223846793005L + 1442695040888963407L
      val noise = ((st >>> 40) % 101).toInt - 50
      math.max(-32768, math.min(32767, v + noise)).toShort
    }
  }

  def resampleTwin(s: Array[Short]): Array[Short] =
    Array.tabulate(s.length / 2)(i => s(2 * i))

  // -------------------------------------------------------------- fixture

  /** Planting layout (the [[ImagePhash.ensureJpegPhashFixture]] pattern):
    * base ids 0..[[NBaseAudio]]-1 are mono PCM16 WAVs at 8 kHz; twins over
    * DISJOINT 100-id base ranges — `scale` (0.45× gain), `dither`
    * (±50-LSB noise), `resample` (4 kHz decimation, the cross-RATE
    * near-dup no byte- or sample-level dedup can see). */
  val NBaseAudio = 400
  val AudioScaleOffset = 10000L    // twins of bases 0..99
  val AudioDitherOffset = 20000L   // twins of bases 100..199
  val AudioResampleOffset = 30000L // twins of bases 200..299

  val audioFixturePath = "/root/repo/target/fixtures/audio_phash_v1.parquet"

  def ensureAudioPhashFixture(spark: SparkSession): Unit = synchronized {
    val p = java.nio.file.Paths.get(audioFixturePath)
    if (!java.nio.file.Files.exists(p)) {
      import spark.implicits._
      val rows = spark.range(NBaseAudio).map { id =>
        (id.longValue, Wav.encode(SampleRate, gridCodeSamples(id)),
          Option.empty[Long], "base")
      }.union(spark.range(100).map { i =>
        (AudioScaleOffset + i, Wav.encode(SampleRate, scaleTwin(gridCodeSamples(i))),
          Option(i.longValue), "scale")
      }).union(spark.range(100, 200).map { i =>
        (AudioDitherOffset + i, Wav.encode(SampleRate, ditherTwin(i, gridCodeSamples(i))),
          Option(i.longValue), "dither")
      }).union(spark.range(200, 300).map { i =>
        (AudioResampleOffset + i, Wav.encode(SampleRate / 2, resampleTwin(gridCodeSamples(i))),
          Option(i.longValue), "resample")
      }).toDF("media_id", "payload", "twin_of", "kind")
      val tmp = audioFixturePath + ".tmp"
      rows.repartition(4).write.mode("overwrite").parquet(tmp)
      java.nio.file.Files.move(java.nio.file.Paths.get(tmp), p,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Decode + fingerprint as one narrow pass — non-audio payloads drop
    * out, so the frame is safe over a mixed-modality corpus. */
  def audioPhashFrame(audio: DataFrame): DataFrame = {
    import audio.sparkSession.implicits._
    audio.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        Wav.decode(payload).map { case (rate, samples) =>
          (id, audioPhash(rate, samples))
        }
      })
      .toDF("media_id", "phash")
  }

  /** Declared key (`audio_phash`): the audio member of the content-level
    * near-dup family. Row equality vs the planted ground truth certifies
    * the WAV chunk-walk decode, the Goertzel band analysis, fingerprint
    * invariance under gain / dither / RESAMPLING (the 4 kHz twin is
    * decoded at a different rate and still lands on its base), and zero
    * false pairs among 400 distinct clips — all through the SAME
    * banded-Hamming machinery as the image keys. */
  def audioPhashQuery(spark: SparkSession, dir: String): DataFrame = {
    ensureAudioPhashFixture(spark)
    ImagePhash.phashDedup(audioPhashFrame(spark.read.parquet(audioFixturePath)
      .select("media_id", "payload")))
      .orderBy("media_id")
  }
}
