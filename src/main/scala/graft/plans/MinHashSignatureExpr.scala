package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Single-pass MinHash signature (SURVEY.md §4.2 custom-Catalyst
  * scorecard): from an array of 64-bit base hashes, computes K=64
  * permutation minima `min_j((A_i * (x_j mod P) + B_i) mod P)` in ONE
  * primitive loop (P = 2^31-1). The built-in formulation — 64 ×
  * `array_min(transform(base, …))` — evaluates 64 interpreted lambdas and
  * allocates 64 intermediate arrays per row; this expression is a tight
  * nested loop in codegen.
  *
  * The `mod P` is NOT optional: `a*x + b` without it is MONOTONE in x, so
  * every "permutation" would pick the same argmin element and the 64
  * signatures would collapse to one hash function in disguise — every doc
  * containing the universe's globally-minimal shingle then shares a full
  * signature, and LSH bucket sizes explode quadratically with corpus size
  * (caught by the 500k-doc scale experiment in r2; invisible at 5k docs).
  * Bounds: x mod P < 2^31, A_i < 2^30 ⇒ products < 2^61 — overflow-free
  * under ANSI semantics.
  */
case class MinHashSignatureExpr(child: Expression) extends UnaryExpression {

  import MinHashSignatureExpr._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash64"
  override def nullable: Boolean = child.nullable

  // containsNull arrays are rejected outright: eval/codegen read primitive
  // slots without isNullAt, and a null element would silently read an
  // undefined value (0 in UnsafeArrayData) instead of null-propagating.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> with non-null elements, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill[Long](K)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val x = (arr.getLong(j) >>> 32) % P
      var i = 0
      while (i < K) {
        val h = (A(i) * x + B(i)) % P
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", A, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", B, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val h = ctx.freshName("h")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $c.numElements();
         |long[] $mins = new long[$K];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  long $x = ($c.getLong($j) >>> 32) % ${P}L;
         |  for (int $i = 0; $i < $K; $i++) {
         |    long $h = ($aRef[$i] * $x + $bRef[$i]) % ${P}L;
         |    if ($h < $mins[$i]) $mins[$i] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignatureExpr {
  val K = 64
  val P = 2147483647L // Mersenne prime 2^31 - 1

  /** Version token of the (A, B) permutation constants, embedded in every
    * persisted artifact DERIVED from signatures (band-index sub-paths:
    * [[graft.operators.MinHashIncremental.writeBandIndex]]) and to be
    * bumped whenever the kernel changes: old-constant signatures probed
    * with new-constant band keys find ZERO candidates, so a stale
    * artifact would leak every near-dup with no error — a versioned path
    * makes it rebuild instead. "mh2" = the splitmix64-mixed constants
    * (the r14 fix below); the unversioned r14 layout is implicitly
    * "mh2" too and is still read (see readBandIndex's fallback).
    * Streaming checkpoints holding band state carry the same hazard:
    * a kernel bump invalidates them, documented at the streaming dedup
    * entry points. */
  val KernelVersion = "mh2"

  /** splitmix64 finalizer (Steele et al., public domain PRNG core): the
    * per-permutation constants MUST NOT be linear in i. The first cut used
    * masked multiples (`A_i = c·(2i+1) & mask`), which made consecutive
    * A's differ by a constant — so for a shingle whose `x mod P` residue
    * is small, `A_i·x + B_i` stays below P across a RUN of consecutive
    * permutations and that one shingle's (linear-in-i) images win most of
    * the 64 minima. A doc containing such a shingle gets a signature
    * dominated by it, and a near-twin differing in exactly that shingle
    * loses ~2/3 of its agreement — measured at the 1M incminhash probe as
    * a ~5e-5 banding-miss rate on Jaccard-0.97 planted pairs (theory for
    * honest minhash: ~1e-14). Mixed constants leave no cross-i structure:
    * the same probe then recovers every planted pair. */
  private def mix(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  val A: Array[Long] = Array.tabulate(K)(i => (mix(i) & 0x3FFFFFFFL) | 1L)
  val B: Array[Long] = Array.tabulate(K)(i => mix(i + 7919L) & 0x3FFFFFFFL)
}
