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
  * The DECODE step is environment-dependent (no image/audio codecs in this
  * container) and is STUBBED behind [[MediaDecoder]]: a deterministic fake
  * that "decodes" bytes into fixed-shape features. Everything around it —
  * schema, batching, partition-level iteration, feature columns, the
  * downstream similarity/dedup plumbing — is real Spark and is what a
  * production decoder would drop into.
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

  /** Deterministic stand-in for a real codec/model: features are a stable
    * function of the payload bytes (rolling hash folded into `dim` floats).
    * A real implementation replaces ONLY this object. */
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
  }

  /** Deterministic synthetic media table: payload bytes derived from the
    * id (stands in for real image/audio blobs; zero-egress container has
    * no codecs or fixtures). */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      val modality = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
      val payload = Array.tabulate[Byte](64 + (id % 64).toInt)(i => ((id * 131 + i * 7) % 251).toByte)
      MediaRow(id, payload,
        MediaMeta(modality, if (modality == "image") "png" else "mkv",
          width = 16 + (id % 16).toInt, height = 16, durationMs = id % 5000))
    }
  }

  val fixturePath = "/root/repo/target/fixtures/media.parquet"

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
