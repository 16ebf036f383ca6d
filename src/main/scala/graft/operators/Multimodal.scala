package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines (SURVEY.md §2.7 E4).
  *
  * Model: media is an opaque BINARY column plus a typed metadata struct
  * (`modality`, `format`, `width/height` or `duration_ms`, `sample_rate`) —
  * no custom Spark types needed; parquet stores binary natively, columnar
  * pruning skips payload bytes when a query touches only metadata.
  *
  * The decode layer, by modality: CONTAINER parsing (image dimensions
  * from PNG IHDR / JPEG SOF headers) is REAL — [[MediaDecoder.decodeDims]]
  * reads the payload bytes with no codec library, and the declared
  * `media_dims` key cross-checks the parsed dims against the fixture's
  * metadata columns via the DuckDB oracle. CONTENT decoding is real for
  * the image modality (pure-JVM PNG + baseline-JPEG pixel decode →
  * [[ImagePhash]] perceptual hash and [[ImageEmbed]] spectral embedding)
  * and the audio modality (RIFF/WAVE PCM → [[AudioPhash]] Goertzel
  * fingerprint), each oracle-gated over planted-twin fixtures of real
  * byte streams. [[MediaDecoder.decode]] remains only as the
  * deterministic byte-fold fallback for THIS synthetic mixed fixture
  * (whose image payloads are header+junk) and for modalities with no
  * JVM-feasible codec (video) — a production model swaps in at exactly
  * that call site; the schema, batching, partition-level iteration, and
  * downstream similarity/dedup plumbing are the same real Spark either
  * way.
  *
  * Scale notes: decode is the expensive narrow stage; it runs inside
  * `mapPartitions` so a real decoder amortizes model/codec init once per
  * PARTITION, not per row (same shape as Python's mapInPandas batching).
  * Payload bytes never shuffle: features are extracted first and only the
  * (id, feature) projection flows into joins/aggregations downstream.
  */
object Multimodal {

  case class MediaMeta(modality: String, format: String,
      width: Int, height: Int, durationMs: Long)
  case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, modality: String,
      n_bytes: Int, checksum: Long, features: Array[Float])
  case class MediaDims(media_id: Long, fmt: String, width: Int, height: Int)
  case class MediaPayload(media_id: Long, payload: Array[Byte])

  /** Payload-byte decoding. [[decodeDims]] is a REAL pure-JVM container
    * parse (PNG IHDR / JPEG SOF — the header formats are public specs and
    * need no codec); [[decode]] remains the deterministic stand-in for the
    * pixel/sample→feature model this container can't run. A production
    * implementation replaces ONLY [[decode]]. */
  object MediaDecoder {
    val dim = 8
    def decode(payload: Array[Byte], modality: String): Array[Float] = {
      val acc = new Array[Long](dim)
      var i = 0
      while (i < payload.length) {
        acc(i % dim) = acc(i % dim) * 31 + (payload(i) & 0xff)
        i += 1
      }
      acc.map(v => ((v % 1000L) / 1000.0f))
    }
    def checksum(payload: Array[Byte]): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31 * h + (payload(i) & 0xff); i += 1 }
      h
    }

    private val PngSig =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    private def be32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

    private def be16(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

    /** Image dimensions parsed from the container header, codec-free:
      *  - PNG: 8-byte signature, then the IHDR chunk (spec-mandated first)
      *    carries width/height as big-endian u32 at fixed offsets.
      *  - JPEG: SOI then a marker-segment walk (each segment is
      *    FF <marker> <u16 length incl. itself>) until a start-of-frame
      *    marker (C0–CF minus C4/C8/CC), whose payload is
      *    precision(1) height(2) width(2).
      * Returns None for anything else (non-image payloads, truncation,
      * corrupt headers) — never throws, so it is safe to run over a mixed
      * corpus and use as the modality filter itself. */
    def decodeDims(payload: Array[Byte]): Option[(String, Int, Int)] = {
      if (payload.length >= 24 && payload.take(8).sameElements(PngSig) &&
          payload.slice(12, 16).sameElements("IHDR".getBytes("US-ASCII"))) {
        val w = be32(payload, 16)
        val h = be32(payload, 20)
        if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
          Some(("png", w.toInt, h.toInt))
        else None
      } else if (payload.length >= 4 &&
          (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8) {
        var i = 2
        while (i + 3 < payload.length) {
          if ((payload(i) & 0xff) != 0xff) return None // lost marker sync
          val marker = payload(i + 1) & 0xff
          if (marker == 0xff) { i += 1 } // fill bytes before a marker
          else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) {
            i += 2 // standalone marker, no length field
          } else if (marker >= 0xc0 && marker <= 0xcf &&
              marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
            if (i + 9 > payload.length) return None
            val h = be16(payload, i + 5)
            val w = be16(payload, i + 7)
            return if (w > 0 && h > 0) Some(("jpeg", w, h)) else None
          } else {
            val len = be16(payload, i + 2)
            if (len < 2) return None
            i += 2 + len
          }
        }
        None
      } else None
    }

    /** Minimal VALID PNG header for the synthetic fixture: signature +
      * IHDR (8-bit RGB, junk CRC — [[decodeDims]] and real header readers
      * don't verify it). */
    def pngHeader(width: Int, height: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(33)
      b.put(PngSig).putInt(13).put("IHDR".getBytes("US-ASCII"))
      b.putInt(width).putInt(height)
      b.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      b.putInt(0xdeadbeef) // CRC placeholder
      b.array()
    }

    /** Minimal JPEG header: SOI + APP0/JFIF + a COM segment (so the parser
      * proves real segment-walking, not an assumed fixed SOF offset) +
      * SOF0 with the given dimensions. */
    def jpegHeader(width: Int, height: Int): Array[Byte] = {
      val com = "graft synthetic".getBytes("US-ASCII")
      val b = java.nio.ByteBuffer.allocate(2 + 18 + 4 + com.length + 19)
      b.put(0xff.toByte).put(0xd8.toByte) // SOI
      b.put(0xff.toByte).put(0xe0.toByte).putShort(16) // APP0, len 16
      b.put("JFIF".getBytes("US-ASCII")).put(0.toByte)
      b.put(1.toByte).put(1.toByte).put(0.toByte)
      b.putShort(1).putShort(1).put(0.toByte).put(0.toByte)
      b.put(0xff.toByte).put(0xfe.toByte).putShort((2 + com.length).toShort) // COM
      b.put(com)
      b.put(0xff.toByte).put(0xc0.toByte).putShort(17) // SOF0, 3 components
      b.put(8.toByte).putShort(height.toShort).putShort(width.toShort)
      b.put(3.toByte)
      b.put(1.toByte).put(0x22.toByte).put(0.toByte)
      b.put(2.toByte).put(0x11.toByte).put(1.toByte)
      b.put(3.toByte).put(0x11.toByte).put(1.toByte)
      b.array()
    }
  }

  /** Deterministic synthetic media table. IMAGE payloads are genuine
    * PNG/JPEG byte streams — a real container header encoding the
    * metadata's width/height, followed by deterministic junk "compressed
    * data" (no codec in the container can produce real pixel data, but the
    * header IS the real format, so [[MediaDecoder.decodeDims]] exercises
    * the same parse a production reader performs). Audio/video payloads
    * are opaque junk whose byte recurrence provably never collides with a
    * PNG signature or JPEG SOI (consecutive bytes differ by 7 mod 251, so
    * neither 0x89 0x50 nor 0xff 0xd8 can occur at offset 0). */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      val modality = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
      val width = 16 + (id % 16).toInt
      val height = 12 + (id % 9).toInt
      val fmt =
        if (modality != "image") "mkv" else if (id % 6 == 0) "png" else "jpeg"
      val junk = Array.tabulate[Byte](64 + (id % 64).toInt)(i => ((id * 131 + i * 7) % 251).toByte)
      val payload = fmt match {
        case "png"  => MediaDecoder.pngHeader(width, height) ++ junk
        case "jpeg" => MediaDecoder.jpegHeader(width, height) ++ junk
        case _      => junk
      }
      MediaRow(id, payload,
        MediaMeta(modality, fmt, width, height, durationMs = id % 5000))
    }
  }

  // v2: image payloads carry real PNG/JPEG headers (media_dims key); the
  // version bump forces regeneration of any v1 fixture left on disk.
  val fixturePath = "/root/repo/target/fixtures/media_v2.parquet"

  /** Deterministic media parquet fixture for the declared E4 queries (the
    * binary-column analog of [[graft.sources.Sources.ensureBigFixture]]):
    * 4,000 synthetic rows plus 500 EXACT payload duplicates re-keyed to ids
    * 10000..10499, so payload dedup has real work. Written once, moved into
    * place atomically; both Spark and the DuckDB oracle read the SAME
    * files, so cross-engine compare is exact. */
  def ensureMediaFixture(spark: SparkSession): Unit = synchronized {
    val p = java.nio.file.Paths.get(fixturePath)
    if (!java.nio.file.Files.exists(p)) {
      import spark.implicits._
      val base = syntheticMedia(spark, 4000)
      val dups = base.filter(col("media_id") < 500)
        .map(r => r.copy(media_id = r.media_id + 10000L))
      val tmp = fixturePath + ".tmp"
      base.union(dups).repartition(4).write.mode("overwrite").parquet(tmp)
      java.nio.file.Files.move(java.nio.file.Paths.get(tmp), p,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Declared query `media_stats`: metadata-only per-modality stats over
    * the parquet fixture — the scan must never touch payload bytes
    * (columnar pruning; asserted in PlanAuditSpec via ReadSchema). */
  def mediaStatsQuery(spark: SparkSession, dir: String): DataFrame = {
    ensureMediaFixture(spark)
    import spark.implicits._
    mediaStats(spark.read.parquet(fixturePath).as[MediaRow])
  }

  /** Declared query `payload_dedup`: decode-stage fingerprint dedup over
    * the fixture. Output drops the Scala-side checksum (not
    * SQL-expressible); the DuckDB oracle partitions by the payload BYTES
    * directly — equal iff the checksum+length fingerprint is collision-free
    * on the fixture, which is the dedup contract being verified. */
  def payloadDedupQuery(spark: SparkSession, dir: String): DataFrame = {
    ensureMediaFixture(spark)
    import spark.implicits._
    payloadDedup(extractFeatures(spark.read.parquet(fixturePath).as[MediaRow]))
      .select(col("media_id"), col("modality"), col("n_bytes"))
      .orderBy("media_id")
  }

  /** Declared query `media_dims`: REAL container decode — image
    * dimensions parsed from the payload BYTES alone (PNG IHDR / JPEG SOF
    * via [[MediaDecoder.decodeDims]]; the metadata columns are never
    * read on the Spark side). The DuckDB oracle answers from the fixture's
    * metadata width/height/format columns instead — the compare certifies
    * byte-parse == recorded metadata on every image row, and that decode
    * returns None on exactly the non-image payloads (a false positive or
    * false negative changes the row set). The scan reads ONLY
    * (media_id, payload) — the plan itself proves the metadata columns
    * can't leak into the answer (ReadSchema asserted in PlanAuditSpec).
    * Decode is a narrow mapPartitions stage; only (id, fmt, w, h) flows
    * into the final sort. */
  def mediaDimsQuery(spark: SparkSession, dir: String): DataFrame = {
    ensureMediaFixture(spark)
    import spark.implicits._
    spark.read.parquet(fixturePath)
      .select("media_id", "payload").as[MediaPayload]
      .mapPartitions(_.flatMap { r =>
        MediaDecoder.decodeDims(r.payload).map { case (fmt, w, h) =>
          MediaDims(r.media_id, fmt, w, h)
        }
      })
      .toDF()
      .orderBy("media_id")
  }

  /** The decode/feature-extract stage: mapPartitions so a real decoder
    * initializes once per partition. Output drops the payload — only
    * features flow downstream. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: open codec/model HERE, once per partition
      rows.map { r =>
        MediaFeatures(r.media_id, r.meta.modality, r.payload.length,
          MediaDecoder.checksum(r.payload),
          MediaDecoder.decode(r.payload, r.meta.modality))
      }
    }
  }

  /** Metadata-only query — reads no payload bytes (columnar pruning):
    * per-modality size/duration stats. */
  def mediaStats(media: Dataset[MediaRow]): DataFrame =
    media.toDF()
      .groupBy(col("meta.modality").as("modality"))
      .agg(count(lit(1)).as("n"),
        avg(col("meta.width")).as("avg_width"),
        max(col("meta.durationMs")).as("max_duration_ms"))
      .orderBy("modality")

  /** Frame-sample analog: keep every k-th media row per modality
    * (deterministic systematic sampling on the id — the video-frame
    * sampling pattern at table granularity). */
  def sampleEveryK(media: Dataset[MediaRow], k: Int): Dataset[MediaRow] =
    media.filter(col("media_id") % k === 0)

  /** Exact payload dedup across modalities via checksum + byte-length
    * (the binary-column version of document dedup: narrow fingerprint,
    * shuffle only the fingerprint). */
  def payloadDedup(features: Dataset[MediaFeatures]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("checksum", "n_bytes").orderBy("media_id")
    features.toDF()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }
}
