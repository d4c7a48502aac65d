package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression computing a k-slot MinHash signature from a
  * document's pre-hashed shingle array in ONE fused loop.
  *
  * `sig[i] = min over shingles of (A_i * h + B_i)` — the classic
  * one-strong-hash-plus-k-affine-maps construction (Carter–Wegman style;
  * the shingle is hashed ONCE with xxhash64 upstream, and each family
  * member is an odd-multiplier affine permutation of Z/2^64, evaluated
  * with JVM wrapping arithmetic — which is also why this must be a native
  * expression: ANSI-mode SQL multiplication would overflow-throw).
  *
  * Plan-shape consequence, and the real reason this exists: the composed
  * alternative explodes shingle rows and runs k separate `min` aggregates
  * (k hash evaluations per exploded row, a hash-aggregate probe per row,
  * and a doc-keyed exchange). This expression turns the whole signature
  * stage into per-row map work — no explode, no aggregate, NO SHUFFLE at
  * any scale — with a k-long local array and a fused (shingles × k)
  * multiply-add-min loop.
  *
  * An EMPTY shingle array yields a signature of Long.MaxValue fillers;
  * callers must filter empty-shingle documents first (they'd otherwise
  * all band together as mutual candidates). Kept total rather than
  * null-emitting to stay inside nullSafeCodeGen's contract.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  // bounds checked HERE, not only in the Column helper: a directly
  // constructed expression with k > MaxK would otherwise pass analysis
  // and fail per-row inside every task with an index error
  require(k > 0, s"signature needs at least one slot, got $k")
  require(k <= MinHashSignature.MaxK,
    s"at most ${MinHashSignature.MaxK} signature slots, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> shingle hashes, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      // null elements are absent features (guards containsNull inputs)
      if (!hs.isNullAt(j)) {
        val h = hs.getLong(j)
        var i = 0
        while (i < k) {
          val v = MinHashSignature.A(i) * h + MinHashSignature.B(i)
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val a = ctx.addReferenceObj("minhashA", MinHashSignature.A, "long[]")
      val b = ctx.addReferenceObj("minhashB", MinHashSignature.B, "long[]")
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |int $n = $hs.numElements();
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($hs.isNullAt($j)) continue;
         |  long $h = $hs.getLong($j);
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $v = $a[$i] * $h + $b[$i];
         |    if ($v < $mins[$i]) $mins[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  private val MaxK = 1024

  /** Odd multipliers / offsets of the affine family, derived from the
    * golden-ratio and splitmix64 mixing constants — deterministic across
    * JVMs, odd `A` so each map is a bijection of Z/2^64. */
  private[functions] val A: Array[Long] =
    Array.tabulate(MaxK)(i => 0x9E3779B97F4A7C15L * (2L * i + 1L))
  private[functions] val B: Array[Long] =
    Array.tabulate(MaxK)(i => 0xBF58476D1CE4E5B9L * i + 0x94D049BB133111EBL)

  /** `minhash_signature(hs, k)` as a Column over an `array<bigint>` of
    * per-shingle 64-bit hashes. */
  def minhash_signature(hs: Column, k: Int): Column = {
    require(k <= MaxK, s"at most $MaxK signature slots, got $k")
    import org.apache.spark.sql.graft.shim
    shim.column(MinHashSignature(shim.expression(hs), k))
  }
}
