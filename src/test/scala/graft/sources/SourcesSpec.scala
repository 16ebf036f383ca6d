package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Source/sink operators (SURVEY.md §2.1/§2.2): NDJSON fixture parity
  * (990,000 records, blank lines skipped, gzip transparent), sequence
  * source, typed POJO scan, file-sink round trip. */
class SourcesSpec extends SparkSpec {

  test("S5: big NDJSON gz fixture reads exactly 990,000 records, blanks skipped") {
    Sources.ensureBigFixture()
    val df = spark.read.schema(Sources.jsonSchema).json(Sources.bigFixture)
    assert(df.count() === 990000L)
    assert(df.filter(col("my_field1").isNull).count() === 0L)
    assert(df.select("my_field3").distinct().count() === 30L)
  }

  test("S1: seq_source covers the full range exactly once") {
    val out = Sources.seqSource(spark, sf0001).collect()
    assert(out.map(_.getAs[Long]("n")).sum === 1000000L)
    assert(out.map(_.getAs[Long]("id_min")).min === 0L)
    assert(out.map(_.getAs[Long]("id_max")).max === 999999L)
  }

  test("DSv2: graft-zipjson prunes the read schema to the projection") {
    val dir = tmpDir("zipprune")
    val zout = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(s"$dir/p.zip")))
    zout.putNextEntry(new java.util.zip.ZipEntry("p.json"))
    zout.write((0 until 10).map(i =>
      s"""{"my_field1":$i,"my_field2":${i * 2},"my_field3":"t$i"}""").mkString("\n").getBytes("UTF-8"))
    zout.closeEntry(); zout.close()
    val pruned = spark.read.format("graft-zipjson").load(dir).select("my_field3")
    val scans = pruned.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }
    assert(scans.nonEmpty, "projection must still read through the DSv2 scan")
    assert(scans.head.scan.readSchema().fieldNames.toSeq === Seq("my_field3"),
      "SupportsPushDownRequiredColumns must narrow the scan to the projected field")
    // and the pruned read returns the same values as the full read
    assert(pruned.collect().map(_.getString(0)).sorted ===
      (0 until 10).map(i => s"t$i").sorted.toArray)
  }

  test("DSv2: graft-zipjson pushes comparison filters into the reader") {
    val dir = tmpDir("zipfilter")
    val zout = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(s"$dir/p.zip")))
    zout.putNextEntry(new java.util.zip.ZipEntry("p.json"))
    zout.write((0 until 20).map(i =>
      s"""{"my_field1":$i,"my_field2":${i * 2},"my_field3":"t${i % 3}"}""").mkString("\n").getBytes("UTF-8"))
    zout.closeEntry(); zout.close()
    // filter column (my_field1) pruned OUT of the projection — the reader
    // must evaluate it on the JSON node, not the output row
    val df = spark.read.format("graft-zipjson").load(dir)
      .filter(col("my_field1") > 12 && col("my_field3") === "t0")
      .select("my_field2")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(my_field1)") ||
      plan.contains("GreaterThan(my_field1,12)"),
      s"pushed filters must reach the scan description: ${plan.take(600)}")
    assert(!plan.contains("(2) Filter") && !df.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.FilterExec]),
      "fully-pushed predicates must plan NO post-scan Filter node")
    // rows 15, 18 have field1 > 12 and field3 = t0
    assert(df.collect().map(_.getInt(0)).sorted === Array(30, 36))
  }

  test("DSv2: pushed filters match row-materialization semantics on edge cases") {
    val dir = tmpDir("zipedge")
    val zout = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(s"$dir/p.zip")))
    zout.putNextEntry(new java.util.zip.ZipEntry("p.json"))
    // line 1/2: adjacent longs beyond 2^53 (collide if compared as doubles);
    // line 3: number encoded as a JSON string (Jackson coerces at
    // materialization, so the pushed filter must too); line 4: null field
    zout.write(Seq(
      s"""{"my_field1":${(1L << 53) + 1},"my_field2":1,"my_field3":"a"}""",
      s"""{"my_field1":${1L << 53},"my_field2":2,"my_field3":"b"}""",
      """{"my_field1":"15","my_field2":3,"my_field3":"c"}""",
      """{"my_field1":null,"my_field2":4,"my_field3":"d"}""").mkString("\n").getBytes("UTF-8"))
    zout.closeEntry(); zout.close()
    def scan = spark.read.format("graft-zipjson").load(dir)
    // long comparison must not round through double: only the +1 row passes
    assert(scan.filter(col("my_field1") > (1L << 53)).collect().map(_.getInt(1)) === Array(1))
    // equality on the string-encoded number matches the coerced row value
    assert(scan.filter(col("my_field1") === 15L).collect().map(_.getInt(1)) === Array(3))
    // null field: comparison never satisfied, IsNull semantics intact
    assert(scan.filter(col("my_field1") <= Long.MaxValue).count() === 3)
    assert(scan.filter(col("my_field1").isNull).collect().map(_.getInt(1)) === Array(4))
  }

  test("DSv2: mode=DROPMALFORMED skips bad lines; FAILFAST names the archive") {
    val dir = tmpDir("zipmalformed")
    val zout = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(s"$dir/p.zip")))
    zout.putNextEntry(new java.util.zip.ZipEntry("p.json"))
    zout.write(Seq(
      """{"my_field1":1,"my_field2":1,"my_field3":"a"}""",
      """{"my_field1":2,"my_field2":2,""",
      """{"my_field1":3,"my_field2":3,"my_field3":"c"}""").mkString("\n").getBytes("UTF-8"))
    zout.closeEntry(); zout.close()
    val dropped = spark.read.format("graft-zipjson").option("mode", "DROPMALFORMED").load(dir)
    assert(dropped.collect().map(_.getLong(0)).sorted === Array(1L, 3L))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-zipjson").load(dir).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("Malformed JSON") && msgs.contains("p.zip"),
      s"FAILFAST must name the malformed archive: $msgs")
  }

  test("DSv2: non-object JSON roots are malformed, unknown modes rejected at plan time") {
    val dir = tmpDir("zipnonobj")
    val zout = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(s"$dir/p.zip")))
    zout.putNextEntry(new java.util.zip.ZipEntry("p.json"))
    // `null` and `[1,2]` parse as valid JSON but are not records — they
    // must count as malformed, never as silent all-null rows
    zout.write(Seq("null", "[1,2]",
      """{"my_field1":7,"my_field2":7,"my_field3":"x"}""").mkString("\n").getBytes("UTF-8"))
    zout.closeEntry(); zout.close()
    val dropped = spark.read.format("graft-zipjson").option("mode", "DROPMALFORMED").load(dir)
    assert(dropped.collect().map(_.getLong(0)) === Array(7L))
    intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-zipjson").load(dir).collect()
    }
    val bad = intercept[Exception] {
      spark.read.format("graft-zipjson").option("mode", "PERMISSIVE").load(dir).collect()
    }
    assert(bad.getMessage.contains("FAILFAST or DROPMALFORMED"),
      s"unknown mode must fail loudly, got: ${bad.getMessage}")
  }

  test("S4: pojo_scan typed filter matches untyped column filter") {
    val typed = Sources.pojoScan(spark, sf0001).collect()(0)
    val untyped = graft.Tables.customer(spark, sf0001)
      .filter(col("c_custkey") % 7 === 0)
      .agg(count(lit(1)).as("n"), sum("c_custkey").as("id_sum")).collect()(0)
    assert(typed.getAs[Long]("n") === untyped.getAs[Long]("n"))
    assert(typed.getAs[Long]("id_sum") === untyped.getAs[Long]("id_sum"))
  }

  test("S5 quirk: zip-compressed NDJSON reads through binaryFile + inflate") {
    val dir = tmpDir("zipjson")
    val zipPath = s"$dir/input.json.zip"
    val zout = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(zipPath)))
    zout.putNextEntry(new java.util.zip.ZipEntry("input.json"))
    val body = (0 until 30).map(i =>
      s"""{"my_field1" : ${100 + i}, "my_field2" : $i, "my_field3" : "test$i"}""")
      .mkString("", "\n", "\n\n") // trailing blank line like the reference fixture
    zout.write(body.getBytes("UTF-8")); zout.closeEntry(); zout.close()
    val df = Sources.readZippedNdjson(spark, zipPath)
    assert(df.count() === 30)
    assert(df.agg(sum("my_field1")).head().getLong(0) === (100L until 130L).sum)
    assert(df.schema.fieldNames.toSeq === Seq("my_field1", "my_field2", "my_field3"))
  }

  test("DSv2: graft-zipjson reads a directory of zips, one partition per file") {
    val dir = tmpDir("zipv2")
    def writeZip(name: String, start: Int): Unit = {
      val zout = new java.util.zip.ZipOutputStream(
        java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(s"$dir/$name")))
      zout.putNextEntry(new java.util.zip.ZipEntry("part.json"))
      val body = (start until start + 20).map(i =>
        s"""{"my_field1" : $i, "my_field2" : ${i % 5}, "my_field3" : "test$i"}""")
        .mkString("", "\n", "\n\n")
      zout.write(body.getBytes("UTF-8")); zout.closeEntry(); zout.close()
    }
    writeZip("a.zip", 0); writeZip("b.zip", 1000)
    val df = spark.read.format("graft-zipjson").load(dir)
    assert(df.rdd.getNumPartitions === 2, "one input partition per zip file")
    assert(df.count() === 40)
    assert(df.agg(sum("my_field1")).head().getLong(0) ===
      (0L until 20L).sum + (1000L until 1020L).sum)
    assert(df.schema === Sources.jsonSchema)
  }

  test("S5: corrupt NDJSON records — PERMISSIVE captures, DROPMALFORMED drops, FAILFAST throws") {
    import org.apache.spark.sql.types._
    val dir = tmpDir("corrupt")
    val p = java.nio.file.Paths.get(dir, "mixed.json")
    java.nio.file.Files.writeString(p,
      """{"my_field1" : 1, "my_field2" : 1, "my_field3" : "ok"}
        |THIS IS NOT JSON
        |{"my_field1" : 2, "my_field2" : 2, "my_field3" : "ok2"}
        |""".stripMargin)
    val withCorrupt = Sources.jsonSchema.add(StructField("_corrupt_record", StringType))
    // Spark disallows querying only the corrupt column straight off raw
    // files — materialize first (its own documented workaround)
    val permissive = spark.read.schema(withCorrupt).json(dir).cache()
    try {
      assert(permissive.count() === 3)
      assert(permissive.filter(col("_corrupt_record").isNotNull).count() === 1)
    } finally permissive.unpersist()
    val dropped = spark.read.schema(Sources.jsonSchema)
      .option("mode", "DROPMALFORMED").json(dir)
    assert(dropped.count() === 2)
    intercept[org.apache.spark.SparkException] {
      spark.read.schema(Sources.jsonSchema).option("mode", "FAILFAST").json(dir).count()
    }
  }

  test("K1 layout: partitionBy write enables partition pruning on re-read") {
    import org.apache.spark.sql.functions.year
    val dir = tmpDir("partitioned")
    graft.Tables.orders(spark, sf0001)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("o_year") === 1997)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"), plan.take(600))
    // pruned scan must read only the one year's files
    val expected = graft.Tables.orders(spark, sf0001)
      .filter(year(col("o_orderdate")) === 1997).count()
    assert(pruned.count() === expected)
    val years = new java.io.File(dir).list().count(_.startsWith("o_year="))
    assert(years >= 5, "hive-style partition directories written per year")
  }

  test("K1: file_sink round trip loses nothing") {
    val out = Sinks.fileSink(spark, sf0001)
    val direct = graft.Tables.orders(spark, sf0001).filter("o_orderstatus = 'F'")
    assert(out.count() === direct.count())
    assert(out.agg(sum("o_orderkey")).head().getLong(0) ===
      direct.agg(sum("o_orderkey")).head().getLong(0))
  }
}
