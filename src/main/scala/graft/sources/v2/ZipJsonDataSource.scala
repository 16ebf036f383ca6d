package graft.sources.v2

import graft.sources.Sources
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, IsNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util
import scala.jdk.CollectionConverters._

/** DataSource V2 connector for zip-compressed NDJSON (SURVEY.md §2.1 S4's
  * "TableProvider-style reader interface" + S5's .zip quirk, reference
  * fixtures `input.json.zip`).
  *
  * `spark.read.format("graft-zipjson").load(pathOrDir)` — one input
  * partition PER ZIP FILE (zip is not splittable; parallelism = #files,
  * exactly how the Cassandra reference bounds parallelism by split,
  * CassandraPojoSource.java:57). Entries stream through ZipInputStream;
  * blank lines are skipped; fields parse with Jackson into InternalRows.
  * Schema is the reference fixture's (FIXTURES.md §A1) — declared, never
  * inferred.
  *
  * Path contract: `pathOrDir` is resolved with java.nio on the node that
  * executes each stage (driver for planning, executors for reads) — i.e.
  * LOCAL/shared-filesystem paths only, no Hadoop FileSystem resolution.
  * Fine for single-node and NFS-backed clusters; an HDFS/S3 variant would
  * swap the nio calls for the Hadoop FS API.
  *
  * Read option `mode` (mirroring Spark's JSON source): `FAILFAST`
  * (default) throws on the first malformed line with the archive named;
  * `DROPMALFORMED` skips malformed lines in the reader — the realistic
  * posture for a large file-dropped feed where one bad line must not kill
  * a partition.
  *
  * This is deliberately a minimal-but-real DSv2 implementation: Table →
  * ScanBuilder → Scan → Batch → PartitionReaderFactory → PartitionReader.
  * The ScanBuilder implements SupportsPushDownRequiredColumns: a pruned
  * projection reaches the reader, which then Jackson-extracts ONLY the
  * requested fields per line (the parse of the line itself is unavoidable —
  * NDJSON has no columnar layout — but field materialization, type
  * conversion and row width all shrink to the projection). PlanAuditSpec
  * asserts the pruned ReadSchema through the connector.
  */
class ZipJsonDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-zipjson"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Sources.jsonSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ZipJsonTable(schema, properties.asScala.getOrElse("path",
      throw new IllegalArgumentException("graft-zipjson requires a path")))
}

class ZipJsonTable(tableSchema: StructType, path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-zipjson($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
      // Catalyst hands us projection + predicates before build(); both flow
      // into the Scan and from there to every PartitionReader.
      private val dropMalformed = {
        val mode = options.getOrDefault("mode", "FAILFAST").toUpperCase
        // reject unknown modes at plan time: a typo (DROP_MALFORMED) or
        // Spark-JSON's PERMISSIVE silently flipping to FAILFAST would put
        // the user in the opposite tolerance posture
        require(mode == "FAILFAST" || mode == "DROPMALFORMED",
          s"graft-zipjson mode must be FAILFAST or DROPMALFORMED, got $mode")
        mode == "DROPMALFORMED"
      }
      private var required: StructType = tableSchema
      private var accepted: Array[Filter] = Array.empty
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        // comparisons/null-tests on top-level fields are evaluated on the
        // parsed JSON node BEFORE row materialization (the reader applies
        // them completely, so they are NOT returned as residual — Spark
        // plans no post-scan Filter for them); anything else stays with
        // Spark. Filter-only columns work even when pruned out of the
        // projection: evaluation reads the JSON node, not the output row.
        val (ok, rest) = filters.partition(ZipJsonFilterEval.supported(_, tableSchema))
        accepted = ok
        rest
      }
      override def pushedFilters(): Array[Filter] = accepted
      override def build(): Scan =
        new ZipJsonScan(required, path, accepted, tableSchema, dropMalformed)
    }
}

/** Evaluates the pushable `Filter` subset against a parsed Jackson node.
  *
  * Because accepted filters are NOT returned as residual, this evaluation
  * must EXACTLY match what Spark would compute on the materialized row:
  *  - comparisons read the node with the SAME coercion `buildRow` uses for
  *    the field's declared type (`asLong`/`asInt`/`asText` — so a number
  *    encoded as a JSON string filters identically pushed or not);
  *  - long comparisons stay in long space (a double round-trip would
  *    collide values beyond 2^53);
  *  - string comparisons use UTF8String's binary order, Spark's own
  *    collation, not Java's UTF-16 compareTo (they diverge on
  *    supplementary characters).
  * SQL semantics: a comparison against a missing/null field is NOT
  * satisfied (only IsNull accepts it).
  */
private[v2] object ZipJsonFilterEval {
  import org.apache.spark.sql.types.{IntegerType, LongType}

  def supported(f: Filter, schema: StructType): Boolean = f match {
    case EqualTo(a, _) => schema.fieldNames.contains(a)
    case GreaterThan(a, _) => schema.fieldNames.contains(a)
    case GreaterThanOrEqual(a, _) => schema.fieldNames.contains(a)
    case LessThan(a, _) => schema.fieldNames.contains(a)
    case LessThanOrEqual(a, _) => schema.fieldNames.contains(a)
    case IsNotNull(a) => schema.fieldNames.contains(a)
    case IsNull(a) => schema.fieldNames.contains(a)
    case _ => false
  }

  private def cmp(node: com.fasterxml.jackson.databind.JsonNode, schema: StructType,
      attr: String, value: Any)(op: Int => Boolean): Boolean = {
    val v = node.get(attr)
    if (v == null || v.isNull) return false
    schema(attr).dataType match {
      case LongType =>
        op(java.lang.Long.compare(v.asLong(), value.asInstanceOf[Number].longValue()))
      case IntegerType =>
        op(java.lang.Integer.compare(v.asInt(), value.asInstanceOf[Number].intValue()))
      case _ =>
        op(UTF8String.fromString(v.asText())
          .compareTo(UTF8String.fromString(String.valueOf(value))))
    }
  }

  def eval(f: Filter, schema: StructType,
      node: com.fasterxml.jackson.databind.JsonNode): Boolean = f match {
    case EqualTo(a, v) => cmp(node, schema, a, v)(_ == 0)
    case GreaterThan(a, v) => cmp(node, schema, a, v)(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(node, schema, a, v)(_ >= 0)
    case LessThan(a, v) => cmp(node, schema, a, v)(_ < 0)
    case LessThanOrEqual(a, v) => cmp(node, schema, a, v)(_ <= 0)
    case IsNotNull(a) => { val v = node.get(a); v != null && !v.isNull }
    case IsNull(a) => { val v = node.get(a); v == null || v.isNull }
    case _ => false
  }
}

class ZipJsonScan(readOutSchema: StructType, path: String,
    filters: Array[Filter] = Array.empty,
    fullSchema: StructType = Sources.jsonSchema,
    dropMalformed: Boolean = false) extends Scan with Batch {
  override def readSchema(): StructType = readOutSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-zipjson PushedFilters: [${filters.mkString(", ")}], " +
      s"ReadSchema: ${readOutSchema.simpleString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val p = java.nio.file.Paths.get(path)
    val files =
      if (java.nio.file.Files.isDirectory(p)) {
        // Files.list holds an open directory handle until closed — leaks a
        // driver fd per scan if not released once the listing materializes.
        val stream = java.nio.file.Files.list(p)
        try stream.iterator().asScala
          .filter(_.toString.endsWith(".zip")).map(_.toString).toArray.sorted
        finally stream.close()
      } else Array(path)
    files.map(f => ZipFilePartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ZipJsonReaderFactory(readOutSchema, filters, fullSchema, dropMalformed)
}

case class ZipFilePartition(file: String) extends InputPartition

class ZipJsonReaderFactory(schema: StructType, filters: Array[Filter],
    fullSchema: StructType, dropMalformed: Boolean) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ZipJsonPartitionReader(partition.asInstanceOf[ZipFilePartition].file,
      schema, filters, fullSchema, dropMalformed)
}

class ZipJsonPartitionReader(file: String, schema: StructType,
    filters: Array[Filter] = Array.empty,
    fullSchema: StructType = Sources.jsonSchema,
    dropMalformed: Boolean = false)
    extends PartitionReader[InternalRow] {

  private val zin = new java.util.zip.ZipInputStream(
    java.nio.file.Files.newInputStream(java.nio.file.Paths.get(file)))
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private var reader: java.io.BufferedReader = _
  private var current: InternalRow = _

  private def nextLine(): String = {
    while (true) {
      if (reader != null) {
        val line = reader.readLine()
        if (line == null) reader = null
        else if (line.trim.nonEmpty) return line
      } else {
        val entry = zin.getNextEntry
        if (entry == null) return null
        if (!entry.isDirectory)
          reader = new java.io.BufferedReader(new java.io.InputStreamReader(zin, "UTF-8"))
      }
    }
    null // unreachable
  }

  @annotation.tailrec
  final override def next(): Boolean = {
    val line = nextLine()
    if (line == null) { current = null; false }
    else {
      // a non-object root (`null`, `42`, `[1,2]`) parses without exception
      // but has no fields — it is malformed for a record source, like
      // Spark's JSON reader treats it, not a silent all-null row
      val node =
        try {
          val n = mapper.readTree(line)
          if (!n.isObject) throw new com.fasterxml.jackson.core.JsonParseException(
            s"NDJSON record root must be an object, got: ${n.getNodeType}")
          n
        } catch {
          case e: com.fasterxml.jackson.core.JacksonException =>
            if (dropMalformed) null
            else throw new java.io.IOException(
              s"Malformed JSON line in $file (mode=FAILFAST; " +
                s"use mode=DROPMALFORMED to skip): ${e.getMessage}", e)
        }
      // pushed predicates run on the parsed node BEFORE row materialization;
      // they resolve types against the FULL table schema they were validated
      // against (a filter column may be pruned out of the read schema)
      if (node == null || !filters.forall(ZipJsonFilterEval.eval(_, fullSchema, node))) next()
      else {
        current = buildRow(node)
        true
      }
    }
  }

  private def buildRow(node: com.fasterxml.jackson.databind.JsonNode): InternalRow = {
    val values = schema.fields.map { f =>
        val v = node.get(f.name)
        if (v == null || v.isNull) null
        else f.dataType match {
          case org.apache.spark.sql.types.LongType => java.lang.Long.valueOf(v.asLong())
          case org.apache.spark.sql.types.IntegerType => java.lang.Integer.valueOf(v.asInt())
          case _ => UTF8String.fromString(v.asText())
        }
      }
    new GenericInternalRow(values.asInstanceOf[Array[Any]])
  }

  override def get(): InternalRow = current
  override def close(): Unit = zin.close()
}
