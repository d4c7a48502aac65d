package graft.functions

import java.util.{HashMap => JHashMap, HashSet => JHashSet}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a document's repetition /
  * boilerplate statistics in ONE fused pass over the token array:
  * `struct<n_tokens, n_distinct, top_bigram, tot_bigrams>` — the inputs
  * of the Gopher-family duplicate-token fraction (`1 - n_distinct /
  * n_tokens`) and top-2-gram concentration (`top_bigram / tot_bigrams`).
  *
  * The composed form explodes every bigram and runs two doc-keyed hash
  * aggregates — a corpus-scale explode (rows × tokens) plus two
  * shuffles whose keys carry the gram strings. Here the whole signal is
  * per-row map work: a token hash set for the distinct count and a
  * bigram-hash frequency map with a running max (bigrams are hashed with
  * the same xxhash64 chaining scheme as [[NgramXxHash64]], though null
  * tokens hash as empty strings here rather than being skipped; a 64-bit collision
  * inside one document merges two bigrams with p≈2⁻⁶⁴ — the same
  * accepted argument as the Jaccard/SimHash hash-set operators).
  *
  * Fewer than 2 tokens yields `tot_bigrams = 0`; callers filter those
  * documents (mirroring the oracle, where zero bigram rows drop out of
  * the join). Null tokens count as empty strings (never produced by the
  * tokenizers; kept total for containsNull inputs).
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> tokens, got ${other.simpleString}")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_bigram", LongType, nullable = false),
    StructField("tot_bigrams", LongType, nullable = false)))
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks =>
      s"${ev.value} = graft.functions.RepetitionStats$$.MODULE$$.compute($toks);")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  /** Shared eval/codegen kernel (static module call from codegen). */
  def compute(toks: ArrayData): InternalRow = {
    val n = toks.numElements()
    val seen = new JHashSet[UTF8String](math.min(n * 2, 1 << 16))
    val freq = new JHashMap[Long, Long](math.min(n * 2, 1 << 16))
    var top = 0L
    var prevH = 0L
    var i = 0
    while (i < n) {
      val t0 = toks.getUTF8String(i)
      val t = if (t0 == null) UTF8String.EMPTY_UTF8 else t0
      seen.add(t)
      if (i > 0) {
        // same seed-chaining SCHEME as NgramXxHash64(n=2); NOT
        // bit-compatible with it on null tokens (NgramXxHash64 skips
        // them, this hashes the empty string for totality) — only the
        // within-document frequencies consume these hashes, never a
        // cross-expression comparison
        val bh = XXH64.hashUTF8String(t, prevH)
        val c = freq.merge(bh, 1L, (a, b) => a + b)
        if (c > top) top = c
      }
      prevH = XXH64.hashUTF8String(t, 42L)
      i += 1
    }
    new GenericInternalRow(Array[Any](
      n.toLong, seen.size.toLong, top, math.max(0L, (n - 1).toLong)))
  }

  /** `repetition_stats(toks)` as a Column over an `array<string>` token
    * column → `struct<n_tokens, n_distinct, top_bigram, tot_bigrams>`. */
  def repetition_stats(toks: Column): Column = {
    import org.apache.spark.sql.graft.shim
    shim.column(RepetitionStats(shim.expression(toks)))
  }
}
