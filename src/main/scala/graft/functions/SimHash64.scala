package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression computing a 64-bit SimHash (Charikar 2002)
  * from a document's feature-hash array in one fused loop: bit j of the
  * result is the sign of Σ over features of (±1 by bit j of the feature
  * hash).
  *
  * Same rationale as [[MinHashSignature]]: the composed form needed a
  * feature explode plus a 64-sum aggregate (64 partial buffers and a
  * doc-keyed exchange); this is per-row map work with a 64-int local
  * counter array — no explode, no aggregate, no shuffle at any scale.
  * An empty feature array leaves every counter at the `>= 0` tie, so all
  * 64 bits set (fingerprint -1L) — callers filter featureless documents
  * first rather than relying on a sentinel value. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> feature hashes, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val c = new Array[Int](64)
    var j = 0
    while (j < n) {
      // null elements are absent features (guards containsNull inputs)
      if (!hs.isNullAt(j)) {
        val h = hs.getLong(j)
        var i = 0
        while (i < 64) {
          c(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
          i += 1
        }
      }
      j += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) { if (c(i) >= 0) fp |= (1L << i); i += 1 }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      s"""
         |int $n = $hs.numElements();
         |int[] $c = new int[64];
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($hs.isNullAt($j)) continue;
         |  long $h = $hs.getLong($j);
         |  for (int $i = 0; $i < 64; $i++) {
         |    $c[$i] += ((($h >>> $i) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $fp = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($c[$i] >= 0) $fp |= (1L << $i);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** `simhash64(hs)` as a Column over an `array<bigint>` of per-feature
    * 64-bit hashes. */
  def simhash64(hs: Column): Column = {
    import org.apache.spark.sql.graft.shim
    shim.column(SimHash64(shim.expression(hs)))
  }
}
