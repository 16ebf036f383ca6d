package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The character-entropy counters in one codegen'd pass — the kernel
  * behind [[graft.operators.TextOps.charEntropy]].
  *
  * The HOF form materializes a per-character STRING array (`split(text,
  * "")`), sorts it, and folds an aggregate() with a struct accumulator —
  * four allocations per character per document. Here one code-point scan
  * fills a histogram (dense array for ASCII, map spill for the rest) and
  * the entropy sum falls out of the non-zero bins; nothing per-character
  * is ever allocated. Measured on the `char_entropy` key at sf0.1
  * (isolated keytime min): 3.33 s → 0.54 s (~6×).
  *
  * Returns struct(n, d, acc): non-space code-point count, distinct
  * non-space code points, and Σ round(log10(c)·c·Micro) over the distinct
  * counts — exactly the sorted-run fold's accumulator (a sorted array's
  * runs ARE the per-character multiplicities), micro-quantized with the
  * identical scala BigDecimal HALF_UP arithmetic Spark's `round(_, 0)`
  * applies, so the kernel is bit-equal to the HOF form (asserted in
  * VectorExprSpec) and the DuckDB oracle is untouched. NULL text → NULL.
  * Registered as SQL function `graft_char_stats(text)`.
  */
case class CharStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = CharStatsExpr.Schema
  override def prettyName: String = "graft_char_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING, got ${t.simpleString}")
    }

  override def nullSafeEval(text: Any): Any =
    CharStatsExpr.charStats(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CharStatsExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = ($cls).charStats($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharStatsExpr {

  val Schema: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("d", LongType, nullable = false),
    StructField("acc", LongType, nullable = false)))

  import graft.operators.LmScore.Micro

  /** One term of the micro-quantized entropy sum — the exact arithmetic
    * of the Column form `round(log10(run) * run * Micro, 0).cast(long)`:
    * Spark's Round on a double goes through scala BigDecimal HALF_UP and
    * the cast truncates the rounded double, replicated literally. */
  private def term(c: Int): Long =
    if (c <= 0) 0L
    else scala.math.BigDecimal(math.log10(c.toDouble) * c * Micro)
      .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP)
      .toDouble.toLong

  /** One code-point scan + histogram; also the codegen entry point.
    * Code points (not UTF-16 units) to match `split(text, "")`'s regex
    * segmentation; only U+0020 is "space", matching the HOF filter. */
  def charStats(text: UTF8String): InternalRow = {
    val str = text.toString
    val len = str.length
    val ascii = new Array[Int](128)
    var other: java.util.HashMap[Integer, Integer] = null
    var n = 0L
    var i = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      if (cp != ' ') {
        n += 1
        if (cp < 128) ascii(cp) += 1
        else {
          if (other == null) other = new java.util.HashMap[Integer, Integer]()
          other.merge(cp, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
        }
      }
    }
    var d = 0L
    var acc = 0L
    var k = 0
    while (k < 128) {
      val c = ascii(k)
      if (c > 0) { d += 1; acc += term(c) }
      k += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) { d += 1; acc += term(it.next().intValue()) }
    }
    new GenericInternalRow(Array[Any](n, d, acc))
  }
}
