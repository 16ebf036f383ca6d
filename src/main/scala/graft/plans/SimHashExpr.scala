package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Single-pass 64-bit SimHash from an array of token hashes: for each
  * hash, every signature bit's +1/-1 balance updates in one nested
  * primitive loop; bit i of the result is set iff balance_i ≥ 0. The
  * built-in formulation (64 × `aggregate(transform(hashes, …))`) walks the
  * array 64 times through interpreted lambdas — this kernel walks it once
  * in codegen. Registered as SQL function `graft_simhash64`; equality with
  * the built-in form asserted in VectorExprSpec.
  */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"
  override def nullable: Boolean = child.nullable

  // containsNull arrays rejected: eval/codegen use primitive getLong
  // without isNullAt, so a null element would read an undefined slot.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> with non-null elements, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val bal = new Array[Long](64)
    var j = 0
    while (j < n) {
      val x = arr.getLong(j)
      var i = 0
      while (i < 64) {
        if (((x >>> i) & 1L) == 1L) bal(i) += 1 else bal(i) -= 1
        i += 1
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (bal(i) >= 0) sig |= (1L << i); i += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val bal = ctx.freshName("bal")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $c.numElements();
         |long[] $bal = new long[64];
         |for (int $j = 0; $j < $n; $j++) {
         |  long $x = $c.getLong($j);
         |  for (int $i = 0; $i < 64; $i++) {
         |    if ((($x >>> $i) & 1L) == 1L) $bal[$i] += 1; else $bal[$i] -= 1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($bal[$i] >= 0) $sig |= (1L << $i);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
