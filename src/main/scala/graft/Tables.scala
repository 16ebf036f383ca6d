package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (see TESTDATA.md / FIXTURES.md §B).
  *
  * All reads go through here so scan-level tuning (partition sizing, schema
  * pruning) has one home. Filters/projections are left to Catalyst pushdown —
  * callers express them declaratively and `.explain` shows `PushedFilters`.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` has shipped in two encodings across testdata generations:
    * parquet TIMESTAMP(NANOS, isAdjustedToUTC=false) — which Spark can only
    * read via the `nanosAsLong` escape hatch (raw ns count as LongType) —
    * and plain TIMESTAMP(MICROS) (TimestampType/TimestampNTZType). The
    * loader must not assume either: it branches on the type Spark actually
    * inferred and normalizes both to µs TIMESTAMP_NTZ, the truncation DuckDB
    * applies, so oracle comparisons line up regardless of the file's vintage.
    *
    * `nanosAsLong` stays set unconditionally BEFORE the read: it is required
    * for the ns encoding (without it the read fails at schema inference) and
    * a no-op for µs files. Both confs are also set by [[graft.Engine.session]]
    * at session build; the defensive set here covers the driver's smoke path,
    * which calls `SparkEntry.entry` with an externally built session
    * (documented session-level mutation: a non-UTC zone silently shifts
    * event times).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if (s.conf.get("spark.sql.session.timeZone") != "UTC")
      s.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = table(s, d, "events")
    val tsExpr = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // ns-encoded file read through the escape hatch: truncate ns → µs
        "cast(timestamp_micros(ts div 1000) as timestamp_ntz)"
      case _ =>
        // native µs timestamp (with or without zone): normalize to NTZ
        "cast(ts as timestamp_ntz)"
    }
    raw.withColumn("ts", expr(tsExpr))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Staleness fingerprint for a persisted serving artifact keyed on a
    * source table (BPE merge table, IVFADC index, band index): an md5 over
    * every data file's sorted (name, size, mtime) triple. Byte-total alone
    * is too weak — a regenerated corpus with different CONTENT but the same
    * total would silently serve a stale model; mtime changes on any rewrite,
    * so content regeneration always rotates the artifact path. */
  def corpusFingerprint(dir: String, name: String): String =
    pathFingerprint(s"$dir/$name.parquet")

  /** [[corpusFingerprint]] over an arbitrary parquet file/directory path
    * (fixture tables that don't live in a testdata dir). Recurses into
    * subdirectories so a PARTITIONED artifact (cid=…/part-….parquet)
    * fingerprints its data files, not just the top-level _SUCCESS —
    * files are keyed by their root-relative path so a row moving
    * between partitions rotates the fingerprint too. */
  def pathFingerprint(path: String): String = {
    val root = new java.io.File(path)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isFile) Seq(f)
      else Option(f.listFiles()).map(_.toSeq.flatMap(walk)).getOrElse(Seq.empty)
    val rootPath = root.toPath
    val files = walk(root).map { f =>
      val rel = if (f == root) f.getName
        else rootPath.relativize(f.toPath).toString
      (rel, f)
    }.sortBy(_._1)
    val sig = files.map { case (rel, f) =>
      s"$rel:${f.length()}:${f.lastModified()}"
    }.mkString("|")
    val md = java.security.MessageDigest.getInstance("MD5").digest(sig.getBytes("UTF-8"))
    md.take(8).map(b => f"${b & 0xff}%02x").mkString
  }

  /** Completion marker for MULTI-STEP persisted serving artifacts (the
    * IVFADC append index: build-even-half THEN append). Sub-table
    * `_SUCCESS` files appear as each step's write commits, so a crash
    * between steps leaves a half-built artifact that an exists-check on
    * any sub-table would silently serve forever; the marker is written
    * only after the LAST step, so an interrupted build is rebuilt. */
  def markArtifactComplete(path: String): Unit = {
    val f = java.nio.file.Paths.get(path, "_GRAFT_COMPLETE")
    java.nio.file.Files.createDirectories(f.getParent)
    java.nio.file.Files.write(f, Array.emptyByteArray)
  }

  def artifactComplete(path: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_GRAFT_COMPLETE"))
}
