package graft

import java.time.{LocalDateTime, ZoneOffset}

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.types.TimestampNTZType

/** Regression net for the testdata contract on `events.parquet`.
  *
  * The driver has shipped `ts` in two encodings across testdata
  * generations — parquet TIMESTAMP(NANOS, isAdjustedToUTC=false) and plain
  * TIMESTAMP(MICROS) — and a regeneration between rounds flipped the
  * encoding under a loader that assumed one of them, erroring every
  * event-table key. [[Tables.events]] now branches on the inferred type;
  * this spec pins that contract by writing BOTH encodings as tiny in-test
  * fixtures (Spark cannot write TIMESTAMP(NANOS), so the ns fixture is
  * crafted with the bundled parquet-mr example writer) and asserting the
  * loader yields identical TIMESTAMP_NTZ rows from each.
  */
class TablesSpec extends SparkSpec {

  // one timestamp with sub-µs precision (exercises the ns→µs truncation)
  // and one on a whole second (exercises the no-op path)
  private val t1 = LocalDateTime.of(2026, 3, 1, 12, 34, 56, 123456789)
  private val t2 = LocalDateTime.of(2026, 3, 2, 0, 0, 0, 0)
  private def epochNs(t: LocalDateTime): Long =
    t.toEpochSecond(ZoneOffset.UTC) * 1000000000L + t.getNano

  private def writeNanosFixture(dir: String): Unit = {
    val schema = Types.buildMessage()
      .addField(Types.required(PrimitiveTypeName.INT64).named("event_id"))
      .addField(Types.required(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(
          /* isAdjustedToUTC = */ false, LogicalTypeAnnotation.TimeUnit.NANOS))
        .named("ts"))
      .named("events")
    val f = new SimpleGroupFactory(schema)
    val writer = ExampleParquetWriter
      .builder(new Path(s"$dir/events.parquet"))
      .withConf(spark.sparkContext.hadoopConfiguration)
      .withType(schema)
      .build()
    try {
      writer.write(f.newGroup().append("event_id", 1L).append("ts", epochNs(t1)))
      writer.write(f.newGroup().append("event_id", 2L).append("ts", epochNs(t2)))
    } finally writer.close()
  }

  private def writeMicrosFixture(dir: String): Unit = {
    import spark.implicits._
    // LocalDateTime encodes as TIMESTAMP_NTZ → parquet TIMESTAMP(MICROS,
    // isAdjustedToUTC=false), the regenerated testdata's encoding
    Seq((1L, t1.withNano(123456000)), (2L, t2))
      .toDF("event_id", "ts")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("Tables.events yields identical NTZ rows from ns-long and µs-timestamp files") {
    val nsDir = tmpDir("events-ns")
    val usDir = tmpDir("events-us")
    writeNanosFixture(nsDir)
    writeMicrosFixture(usDir)

    val fromNs = Tables.events(spark, nsDir)
    val fromUs = Tables.events(spark, usDir)
    assert(fromNs.schema("ts").dataType === TimestampNTZType)
    assert(fromUs.schema("ts").dataType === TimestampNTZType)

    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, LocalDateTime)] =
      df.orderBy("event_id").collect()
        .map(r => (r.getLong(0), r.getAs[LocalDateTime]("ts"))).toSeq
    val ns = rows(fromNs)
    val us = rows(fromUs)
    assert(ns === us, "the two encodings must load to the same µs-NTZ rows")
    // the ns fixture really carried sub-µs digits and they truncated, not rounded
    assert(ns.head._2.getNano === 123456000)
  }

  test("testdata contract: the columns the operators key on exist with workable types") {
    // The r10 lesson generalized: when the driver regenerates testdata,
    // drift should fail HERE with a named column, not as nine cryptic key
    // errors. Type sets are permissive — they admit every encoding the
    // loaders/operators handle (events.ts is asserted POST-loader, where
    // both vintages normalize to NTZ; embeddings admit float or double
    // because every consumer casts to array<double> itself).
    import org.apache.spark.sql.types._
    def check(table: String, df: org.apache.spark.sql.DataFrame,
        req: Map[String, Set[DataType]]): Unit =
      req.foreach { case (c, ok) =>
        val f = df.schema.fields.find(_.name == c)
        assert(f.isDefined, s"$table.$c missing — testdata contract drifted")
        assert(ok.exists(t => DataType.equalsIgnoreNullability(t, f.get.dataType)),
          s"$table.$c is ${f.get.dataType.simpleString}, operators handle " +
            ok.map(_.simpleString).mkString("{", ", ", "}"))
      }
    val integral: Set[DataType] = Set(LongType, IntegerType)
    check("documents", Tables.documents(spark, sf0001), Map(
      "doc_id" -> integral, "text" -> Set(StringType), "lang" -> Set(StringType),
      "n_chars" -> integral))
    check("embeddings", Tables.embeddings(spark, sf0001), Map(
      "vec_id" -> integral,
      "embedding" -> Set(ArrayType(FloatType), ArrayType(DoubleType))))
    check("events (post-loader)", Tables.events(spark, sf0001), Map(
      "ts" -> Set(TimestampNTZType), "user_id" -> integral,
      "event_type" -> Set(StringType), "value" -> Set(DoubleType),
      "props" -> Set(StringType)))
  }

  test("pathFingerprint sees nested data files, not just the artifact's top level (r15)") {
    // A PARTITIONED artifact (cid=…/part-….parquet) keeps its data files in
    // subdirectories; a top-level-only fingerprint would hash just _SUCCESS
    // and silently serve a stale model after the partition contents change.
    val dir = tmpDir("fp-rec")
    val sub = new java.io.File(dir, "cid=3")
    sub.mkdirs()
    java.nio.file.Files.write(new java.io.File(dir, "_SUCCESS").toPath,
      Array.emptyByteArray)
    val nested = new java.io.File(sub, "part-0.parquet")
    java.nio.file.Files.write(nested.toPath, "aaaa".getBytes)
    val fp1 = Tables.pathFingerprint(dir)
    // content change in the nested file only (size changes; top level
    // untouched) must rotate the fingerprint
    java.nio.file.Files.write(nested.toPath, "bbbbbbbb".getBytes)
    val fp2 = Tables.pathFingerprint(dir)
    assert(fp1 !== fp2, "nested data-file change must rotate the fingerprint")
    // a file MOVING between partitions (same name/size/mtime, different
    // relative path) rotates too — rel paths key the signature
    val sub2 = new java.io.File(dir, "cid=7"); sub2.mkdirs()
    val moved = new java.io.File(sub2, "part-0.parquet")
    val mtime = nested.lastModified()
    java.nio.file.Files.move(nested.toPath, moved.toPath)
    moved.setLastModified(mtime)
    assert(Tables.pathFingerprint(dir) !== fp2)
  }

  test("artifact completion marker gates multi-step builds (r15)") {
    // the ivfpqAppendRecall hazard: assigned/_SUCCESS commits after the
    // FIRST build step, so a crash before the append leaves a half-built
    // index that a sub-table exists-check would serve forever
    val dir = tmpDir("marker")
    new java.io.File(dir, "assigned").mkdirs()
    java.nio.file.Files.write(
      new java.io.File(s"$dir/assigned", "_SUCCESS").toPath, Array.emptyByteArray)
    assert(!Tables.artifactComplete(dir),
      "a sub-table _SUCCESS alone must NOT read as complete")
    Tables.markArtifactComplete(dir)
    assert(Tables.artifactComplete(dir))
  }

  test("Tables.events loads the driver-generated file under an externally built session") {
    // the driver smoke path: a session Engine.session did NOT configure —
    // the loader's defensive confs must make the read succeed regardless of
    // which encoding the current testdata generation uses
    val ext = spark.newSession()
    ext.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    val df = Tables.events(ext, sf0001)
    assert(df.schema("ts").dataType === TimestampNTZType)
    assert(df.limit(5).count() > 0)
  }
}
