package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.io.{BufferedWriter, OutputStreamWriter}
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

/** Source operators (SURVEY.md §2.1).
  *
  * S1 seq_source   — number-sequence source (reference: DataStreamJob.java:45-49,
  *                   `NumberSequenceSource(0, Long.MAX_VALUE)`); batch analog is
  *                   `spark.range`, which plans a parallel Range scan with no
  *                   input IO at all.
  * S4 pojo_scan    — POJO table scan (reference: CassandraPojoSource.java:51-63).
  *                   Zero-egress env ⇒ parquet scan surfaced as `Dataset[Pojo]`;
  *                   the reference's 15 MB split bound maps to
  *                   `spark.sql.files.maxPartitionBytes`.
  * S5 json_scan    — NDJSON + gzip file source (reference deps pom.xml:90-100,
  *                   fixtures input*.json*): declared schema, gzip decoded
  *                   natively, blank lines skipped natively by BOTH Spark and
  *                   DuckDB (verified) — record count must be exactly 990,000.
  */
object Sources {

  /** Flink-style POJO record (reference: CassandraPojoSource.java:69-105 —
    * `Pojo { long id }`). */
  final case class Pojo(id: Long)

  /** S1: bounded sequence 0..999,999 → modulo-bucketed aggregate. `range` is
    * a generated, splittable source: each task materializes its own slice
    * (no shuffle until the groupBy). */
  def seqSource(spark: SparkSession, dir: String): DataFrame =
    spark.range(0L, 1000000L)
      .withColumn("bucket", col("id") % 97)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("id").as("id_sum"),
        min("id").as("id_min"), max("id").as("id_max"))
      .orderBy("bucket")

  /** S4: parquet scan surfaced as a typed Dataset[Pojo] (customer keys as
    * the POJO ids). The typed filter lambda is deliberate API fidelity with
    * the reference's record-at-a-time POJO processing — NOTE it defeats
    * predicate pushdown (the scan reads all ids), which is why the rest of
    * the engine sticks to Column expressions; see SourcesSpec.
    */
  def pojoScan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pojos = Tables.customer(spark, dir)
      .select(col("c_custkey").as("id")).as[Pojo]
    pojos.filter(_.id % 7 == 0)
      .groupBy()
      .agg(count(lit(1)).as("n"), sum("id").as("id_sum"),
        min("id").as("id_min"), max("id").as("id_max"))
  }

  // ---------------------------------------------------------------- json_scan

  val fixtureDir = "/root/repo/target/fixtures"
  val bigFixture = s"$fixtureDir/input_big.json.gz"

  /** Regenerate the reference's big NDJSON fixture SHAPE (FIXTURES.md §A1)
    * with our own deterministic values: 33,000 repetitions of (30 records +
    * 1 blank line) = 990,000 records, 33,000 blank lines. Values vary by
    * global row index so the aggregate below is non-trivial.
    */
  def ensureBigFixture(): Unit = synchronized {
    val p = Paths.get(bigFixture)
    if (!Files.exists(p)) {
      Files.createDirectories(p.getParent)
      val tmp = Paths.get(bigFixture + ".tmp")
      val w = new BufferedWriter(new OutputStreamWriter(
        new GZIPOutputStream(Files.newOutputStream(tmp)), "UTF-8"), 1 << 20)
      try {
        var block = 0
        while (block < 33000) {
          var j = 0
          while (j < 30) {
            val i = block * 30L + j
            w.write(s"""{"my_field1" : ${4000000L + i}, "my_field2" : ${i % 1000}, "my_field3" : "test${i % 30}"}""")
            w.write("\n")
            j += 1
          }
          w.write("\n") // the reference fixture's interleaved blank line
          block += 1
        }
      } finally w.close()
      Files.move(tmp, p, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  val jsonSchema: StructType = StructType(Seq(
    StructField("my_field1", LongType),
    StructField("my_field2", IntegerType),
    StructField("my_field3", StringType)))

  /** S5: NDJSON w/ gzip + declared schema (no inference — nondeterministic
    * at 100 TB). Gzip is NOT splittable: one file = one task, so at scale
    * the ingest path shards input across MANY .gz files (or recompresses to
    * a splittable codec) — here a single file matches the reference fixture.
    */
  def jsonScan(spark: SparkSession, dir: String): DataFrame = {
    ensureBigFixture()
    spark.read.schema(jsonSchema).json(bigFixture)
      .groupBy("my_field3")
      .agg(count(lit(1)).as("n"), sum("my_field1").as("f1_sum"),
        sum("my_field2").as("f2_sum"))
      .orderBy("my_field3")
  }

  // ---------------------------------------------------------------- zip_scan

  val zipFixtureDir = s"$fixtureDir/zipdir"
  val zipPlainTwin = s"$fixtureDir/input_zip.json"

  /** Deterministic .zip fixture family (the reference ships
    * `input.json.zip` next to the gz form): THREE zip archives × two NDJSON
    * entries × 15,000 records (90,000 total, blank lines interleaved like
    * the reference fixture), plus a plain-text twin with the identical
    * records for the DuckDB oracle (DuckDB reads no zip). Three archives so
    * the DSv2 scan genuinely plans one partition per file.
    */
  def ensureZipFixture(): Unit = synchronized {
    val twin = Paths.get(zipPlainTwin)
    // the twin is moved into place LAST, so its existence implies the zips
    // are complete
    if (!Files.exists(twin)) {
      Files.createDirectories(Paths.get(zipFixtureDir))
      def record(i: Long): String =
        s"""{"my_field1" : ${7000000L + i}, "my_field2" : ${i % 500}, "my_field3" : "zip${i % 23}"}"""
      val twinTmp = Paths.get(zipPlainTwin + ".tmp")
      val tw = new BufferedWriter(new OutputStreamWriter(
        Files.newOutputStream(twinTmp), "UTF-8"), 1 << 20)
      try {
        var i = 0L
        for (f <- 0 until 3) {
          val zout = new java.util.zip.ZipOutputStream(
            Files.newOutputStream(Paths.get(s"$zipFixtureDir/part-$f.zip")))
          val zw = new BufferedWriter(new OutputStreamWriter(zout, "UTF-8"), 1 << 20)
          for (e <- 0 until 2) {
            zout.putNextEntry(new java.util.zip.ZipEntry(s"entry-$e.json"))
            var j = 0
            while (j < 15000) {
              val line = record(i)
              zw.write(line); zw.write("\n")
              tw.write(line); tw.write("\n")
              if (j % 1000 == 999) zw.write("\n") // blank lines, skipped by the reader
              i += 1; j += 1
            }
            zw.flush()
            zout.closeEntry()
          }
          zw.close()
        }
      } finally tw.close()
      Files.move(twinTmp, twin, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** S5/S4: declared query through the `graft-zipjson` DataSource V2
    * connector (TableProvider → Scan → PartitionReader) — one input
    * partition per archive, blank lines skipped by the reader, declared
    * schema. The DuckDB oracle reads the uncompressed twin. */
  def zipScan(spark: SparkSession, dir: String): DataFrame = {
    ensureZipFixture()
    spark.read.format("graft-zipjson").load(zipFixtureDir)
      .groupBy("my_field3")
      .agg(count(lit(1)).as("n"), sum("my_field1").as("f1_sum"),
        sum("my_field2").as("f2_sum"))
      .orderBy("my_field3")
  }

  /** S5 quirk: the reference also ships `.zip` fixtures
    * (`input.json.zip`), which Spark's text/json sources do not decode.
    * Covered with `binaryFile` + per-file inflate in flatMap — each zip is
    * one task (like gzip, zip is not splittable), entries stream through
    * ZipInputStream and lines parse with the SAME declared-schema JSON
    * parser (`from_json`) as the gz path. For 100 TB: shard across many
    * archives; this exists for format parity, not as the scale path.
    */
  def readZippedNdjson(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val lines = spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]]
      .flatMap { bytes =>
        val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var e = zin.getNextEntry
        while (e != null) {
          if (!e.isDirectory) {
            val r = new java.io.BufferedReader(new java.io.InputStreamReader(zin, "UTF-8"))
            var line = r.readLine()
            while (line != null) { out += line; line = r.readLine() }
          }
          e = zin.getNextEntry
        }
        out
      }
    lines.filter(length(trim(col("value"))) > 0)
      .select(from_json(col("value"), jsonSchema, Map.empty[String, String]).as("r"))
      .select("r.*")
  }
}
