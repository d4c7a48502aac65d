package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a document's DEFLATE
  * compressibility in one fused per-row pass:
  * `struct<n_bytes, n_deflate>` — UTF-8 byte length and the raw-DEFLATE
  * (nowrap, fixed level 6) compressed length.
  *
  * The ratio `n_deflate / n_bytes` is the classic cheap "weird text"
  * signal web-corpus pipelines cut on from both ends: heavily
  * template/repeated text compresses far below prose (the same family
  * of boilerplate the Gopher repetition rules target, but
  * tokenizer-free and sensitive to sub-word repetition), while
  * already-compressed or random byte salad refuses to compress at all.
  * Emitting the two INTEGER lengths rather than the float ratio keeps
  * the output engine-exact (the q96/q71 rule) and lets callers pick
  * thresholds as integer cross-multiplications.
  *
  * Scale shape: pure map work inside whole-stage codegen — no shuffle,
  * no UDF boundary; the kernel is a static module call (same pattern as
  * [[RepetitionStats]]). The `Deflater` is NATIVE state that is
  * expensive to construct, so one instance per executor thread is kept
  * in a ThreadLocal and `reset()` between rows; only lengths are
  * accumulated, through one reusable per-thread scratch buffer, so no
  * per-row allocation scales with the compressed size. The instance's
  * native memory lives for the thread's lifetime (never `end()`ed) —
  * bounded by the executor's thread pool, the same lifecycle Spark's
  * own compression codecs accept.
  *
  * Determinism: fixed level + strategy + nowrap makes the length a pure
  * function of the bytes for a given zlib build; the library pins no
  * cross-zlib-version byte contract (neither does any consumer of a
  * compressibility RATIO), which is why the catalog entry is
  * design-gated rather than DuckDB-oracled. */
case class DeflateStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string document, got ${other.simpleString}")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("n_deflate", LongType, nullable = false)))
  override def prettyName: String = "deflate_stats"

  override def nullSafeEval(input: Any): Any =
    DeflateStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.functions.DeflateStats$$.MODULE$$.compute($text);")

  override protected def withNewChildInternal(newChild: Expression): DeflateStats =
    copy(child = newChild)
}

object DeflateStats {

  /** Raw DEFLATE (no zlib header/checksum — the 6 framing bytes would
    * drown short documents' signal), default level. */
  private val Level = 6

  private val deflater = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = new Deflater(Level, true)
  }
  private val scratch = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** Shared eval/codegen kernel (static module call from codegen). */
  def compute(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val d = deflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = scratch.get()
    var out = 0L
    while (!d.finished()) out += d.deflate(buf)
    new GenericInternalRow(Array[Any](bytes.length.toLong, out))
  }

  /** `deflate_stats(text)` as a Column over a string column →
    * `struct<n_bytes, n_deflate>`. */
  def deflate_stats(text: Column): Column = {
    import org.apache.spark.sql.graft.shim
    shim.column(DeflateStats(shim.expression(text)))
  }
}
