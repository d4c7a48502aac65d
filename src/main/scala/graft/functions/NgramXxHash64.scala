package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression hashing every word n-gram of a token array
  * to a 64-bit value in one fused pass: `out[i] = xxhash64(tok[i], …,
  * tok[i+n-1])` with the exact seed-chaining semantics of Spark's
  * multi-argument `xxhash64` (seed 42, each argument hashed with the
  * running value as seed) — asserted bit-identical in the spec.
  *
  * Exists for plan-shape reasons: the composed form
  * (`transform(sequence(...), i -> xxhash64(element_at...))`) contains a
  * higher-order function, and HOFs are CodegenFallback — their presence
  * ejects the ENTIRE projection from whole-stage codegen, so every
  * signature pipeline ran interpreted. With this expression the path
  * scan → n-gram hashes → [[MinHashSignature]]/[[SimHash64]] is one
  * codegen'd stage. Fewer than n tokens yields an empty array (same as
  * the composed form's guard). */
case class NgramXxHash64(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, s"n-gram size must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> tokens, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_xxhash64"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements() - n + 1
    if (m <= 0) new GenericArrayData(Array.emptyLongArray)
    else {
      val out = new Array[Long](m)
      var i = 0
      while (i < m) {
        var h = 42L
        var j = 0
        // null tokens contribute nothing to the chain — the same
        // skip-null semantics as the multi-arg xxhash64 this mirrors
        // (and a guard against NPE on containsNull inputs)
        while (j < n) {
          if (!toks.isNullAt(i + j)) h = XXH64.hashUTF8String(toks.getUTF8String(i + j), h)
          j += 1
        }
        out(i) = h
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val xxh = classOf[XXH64].getName
      s"""
         |int $m = $toks.numElements() - $n + 1;
         |if ($m < 0) $m = 0;
         |long[] $out = new long[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  long $h = 42L;
         |  for (int $j = 0; $j < $n; $j++) {
         |    if (!$toks.isNullAt($i + $j)) {
         |      $h = $xxh.hashUTF8String($toks.getUTF8String($i + $j), $h);
         |    }
         |  }
         |  $out[$i] = $h;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NgramXxHash64 =
    copy(child = newChild)
}

object NgramXxHash64 {
  /** `ngram_xxhash64(toks, n)` as a Column over an `array<string>`. */
  def ngram_xxhash64(toks: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.shim
    shim.column(NgramXxHash64(shim.expression(toks), n))
  }
}
