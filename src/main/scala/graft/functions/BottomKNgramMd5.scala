package graft.functions

import java.security.MessageDigest
import java.util.{Arrays => JArrays, HashSet => JHashSet}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a document's bottom-k fingerprint
  * — the k smallest md5 hex digests of its DISTINCT word n-gram shingles,
  * comma-joined — plus the exact distinct-shingle count, in ONE fused
  * pass over the token array. Output:
  * `struct<fingerprint: string, n_shingles: bigint>`.
  *
  * Exists for plan-shape reasons (the q18 analog of [[NgramXxHash64]] /
  * [[MinHashSignature]]): the composed form — `transform(sh, md5)` +
  * `array_sort` + `slice` over an `array_distinct` of a `transform`-built
  * shingle array — is a chain of CodegenFallback higher-order functions,
  * and ONE HOF anywhere in a projection ejects the whole projection from
  * whole-stage codegen. This expression keeps scan → fingerprint fully
  * codegen'd: shingles are built and deduped in a per-row hash set, each
  * new shingle is digested once, and a k-slot insertion keeps the bottom
  * k digests (unsigned byte order == hex string order, since the
  * nibble→hex-char mapping is monotone) — no shingle array, digest array,
  * or sort is ever materialized. Map-only at any scale.
  *
  * Fewer than n tokens yields `("", 0)` — callers filter those documents
  * (mirroring the oracle, where zero shingle rows drop out of the GROUP
  * BY). Null tokens participate as empty strings (never produced by the
  * tokenizers; kept total for containsNull inputs).
  */
case class BottomKNgramMd5(child: Expression, n: Int, k: Int) extends UnaryExpression {

  require(n > 0, s"n-gram size must be positive, got $n")
  require(k > 0, s"fingerprint needs at least one digest slot, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> tokens, got ${other.simpleString}")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("fingerprint", StringType, nullable = false),
    StructField("n_shingles", LongType, nullable = false)))
  override def prettyName: String = "bottomk_ngram_md5"

  override def nullSafeEval(input: Any): Any =
    BottomKNgramMd5.compute(input.asInstanceOf[ArrayData], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks =>
      s"${ev.value} = graft.functions.BottomKNgramMd5$$.MODULE$$.compute($toks, $n, $k);")

  override protected def withNewChildInternal(newChild: Expression): BottomKNgramMd5 =
    copy(child = newChild)
}

object BottomKNgramMd5 {
  private val Space = UTF8String.fromString(" ")
  private val Hex = "0123456789abcdef".getBytes
  private val md5 : ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Shared eval/codegen kernel; also the codegen entry point (invoked as
    * a static module call, so the projection stays one codegen'd stage). */
  def compute(toks: ArrayData, n: Int, k: Int): InternalRow = {
    val m = toks.numElements() - n + 1
    if (m <= 0) return new GenericInternalRow(Array[Any](UTF8String.EMPTY_UTF8, 0L))
    val md = md5.get()
    val seen = new JHashSet[UTF8String](math.min(m * 2, 1 << 16))
    val slots = new Array[Array[Byte]](k)
    var cnt = 0
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < n) {
        val t = toks.getUTF8String(i + j)
        parts(j) = if (t == null) UTF8String.EMPTY_UTF8 else t
        j += 1
      }
      val sh = UTF8String.concatWs(Space, parts: _*)
      if (seen.add(sh)) {
        val d = md.digest(sh.getBytes)
        if (cnt < k) {
          var p = cnt
          while (p > 0 && JArrays.compareUnsigned(d, slots(p - 1)) < 0) {
            slots(p) = slots(p - 1); p -= 1
          }
          slots(p) = d
          cnt += 1
        } else if (JArrays.compareUnsigned(d, slots(k - 1)) < 0) {
          var p = k - 1
          while (p > 0 && JArrays.compareUnsigned(d, slots(p - 1)) < 0) {
            slots(p) = slots(p - 1); p -= 1
          }
          slots(p) = d
        }
      }
      i += 1
    }
    val out = new Array[Byte](cnt * 33 - 1)
    var o = 0
    var s = 0
    while (s < cnt) {
      if (s > 0) { out(o) = ','; o += 1 }
      val d = slots(s)
      var b = 0
      while (b < 16) {
        out(o) = Hex((d(b) >>> 4) & 0xf); o += 1
        out(o) = Hex(d(b) & 0xf); o += 1
        b += 1
      }
      s += 1
    }
    new GenericInternalRow(Array[Any](UTF8String.fromBytes(out), seen.size.toLong))
  }

  /** `bottomk_ngram_md5(toks, n, k)` as a Column over an `array<string>`
    * token column → `struct<fingerprint, n_shingles>`. */
  def bottomk_ngram_md5(toks: Column, n: Int, k: Int): Column = {
    import org.apache.spark.sql.graft.shim
    shim.column(BottomKNgramMd5(shim.expression(toks), n, k))
  }
}
