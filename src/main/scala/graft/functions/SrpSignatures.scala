package graft.functions

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression computing ALL sign-random-projection LSH
  * signatures of a vector in one fused loop: `out[t]` packs `bits` sign
  * bits, bit b being the sign of the dot product against the fixed
  * uniform[-1,1) hyperplane for (table t, bit b) — the same continuous
  * family (entry = `MurmurHash3.productHash((t, b, d))` mapped to
  * [-1, 1)) as the composed `srpSignature` form, so signature VALUES are
  * identical (asserted bit-exact in the spec; dots accumulate strictly
  * left-to-right like VectorDot).
  *
  * The family is continuous rather than Rademacher (±1) deliberately:
  * measured on the near-random test embeddings, ±1 planes derived from
  * a hash's single parity bit carry pairwise correlations (max |corr|
  * 0.44 across the 14-bit family) that cost ~0.12 recall@5 at identical
  * candidate volume; using all 32 hash bits as a uniform value removes
  * the correlation at zero runtime cost (the plane matrix is
  * precomputed either way).
  *
  * Exists because the composed form evaluates tables×bits separate
  * VectorDots, each reading its plane from a `typedlit`
  * GenericArrayData — a BOXED Double unbox per element access, ~50 M of
  * them per 4k-vector corpus. Here the planes live in one primitive
  * `double[]` referenced from generated code: no boxing, no per-plane
  * object, one (tables×bits×dim) multiply-add loop per row. */
case class SrpSignatures(child: Expression, tables: Int, bits: Int, dim: Int)
    extends UnaryExpression {

  require(tables > 0 && bits > 0 && bits <= 31 && dim > 0,
    s"invalid SRP shape: tables=$tables bits=$bits dim=$dim")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "srp_signatures"

  /** Flat uniform[-1,1) plane matrix, laid out [(table, bit, d)] —
    * deterministic from the structural hash, identical on every
    * JVM/executor, and recomputed after deserialization (cheap:
    * tables×bits×dim doubles). */
  @transient private lazy val planes: Array[Double] =
    SrpSignatures.planes(tables, bits, dim)

  // Null-element contract: same as [[VectorDot]] — null ARRAYS propagate
  // null (nullSafeEval/nullSafeCodeGen), null ELEMENTS are not supported;
  // embedding columns are non-null by contract, and both this and the
  // composed per-plane form read elements primitively, so their outputs
  // stay bit-identical on every supported input.
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var sig = 0
      var b = 0
      while (b < bits) {
        val base = (t * bits + b) * dim
        var acc = 0.0
        var d = 0
        while (d < n) { acc += v.getDouble(d) * planes(base + d); d += 1 }
        if (acc >= 0) sig |= (1 << b)
        b += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val p = ctx.addReferenceObj("srpPlanes", planes, "double[]")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val sig = ctx.freshName("sig")
      val base = ctx.freshName("base")
      s"""
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |int[] $out = new int[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  int $sig = 0;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    int $base = ($t * $bits + $b) * $dim;
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $acc += $v.getDouble($d) * $p[$base + $d];
         |    }
         |    if ($acc >= 0) $sig |= (1 << $b);
         |  }
         |  $out[$t] = $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SrpSignatures =
    copy(child = newChild)
}

object SrpSignatures {
  /** One plane entry: all 32 hash bits as an unsigned value mapped to
    * uniform [-1, 1). Shared with `Similarity.planeVal` so the composed
    * and fused forms agree bit-exactly. */
  private[graft] def planeEntry(table: Int, bit: Int, d: Int): Double =
    (MurmurHash3.productHash((table, bit, d)).toLong & 0xffffffffL) /
      2147483648.0 - 1.0

  /** The continuous plane family, flattened. */
  private[graft] def planes(tables: Int, bits: Int, dim: Int): Array[Double] = {
    val out = new Array[Double](tables * bits * dim)
    var i = 0
    var t = 0
    while (t < tables) {
      var b = 0
      while (b < bits) {
        var d = 0
        while (d < dim) {
          out(i) = planeEntry(t, b, d)
          i += 1; d += 1
        }
        b += 1
      }
      t += 1
    }
    out
  }

  /** `srp_signatures(emb, tables, bits, dim)` as a Column over
    * `array<double>`: one packed int signature per hash table. */
  def srp_signatures(emb: Column, tables: Int, bits: Int, dim: Int): Column = {
    import org.apache.spark.sql.graft.shim
    shim.column(SrpSignatures(shim.expression(emb), tables, bits, dim))
  }
}
