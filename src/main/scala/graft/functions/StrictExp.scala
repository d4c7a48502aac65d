package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** `StrictMath.exp` as a native expression — the bit-reproducible
  * exponential Spark's own `exp` cannot be.
  *
  * `java.lang.Math.exp` is licensed to differ from the fdlibm result by
  * 1 ulp, and HotSpot exercises that license: the interpreter runs the
  * native fdlibm implementation while C2 substitutes a vectorized
  * intrinsic whose low bit can differ per input. Any computation that
  * feeds `exp` into an exactness contract (q132's deterministic
  * gradient descent: per-row doubles → decimal cast → exact sum) would
  * therefore change results with JIT warm-up state, partition
  * scheduling across differently-warmed executor threads, or the
  * driver-twin comparison the spec runs. `StrictMath.exp` is SPECIFIED
  * to reproduce fdlibm bit-for-bit on every JVM, tier, and
  * architecture — the determinism anchor for learned operators, at the
  * cost of the intrinsic's speed (irrelevant next to a training
  * aggregate's shuffle).
  *
  * Map-only, fully codegen'd (the generated code is the direct static
  * call), null-propagating like every arithmetic expression. */
case class StrictExp(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a double, got ${other.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "strict_exp"

  override def nullSafeEval(input: Any): Any =
    StrictMath.exp(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"java.lang.StrictMath.exp($v)")

  override protected def withNewChildInternal(newChild: Expression): StrictExp =
    copy(child = newChild)
}

object StrictExp {
  /** `strict_exp(x)` as a Column over a double column. */
  def strict_exp(x: Column): Column = {
    import org.apache.spark.sql.graft.shim
    shim.column(StrictExp(shim.expression(x)))
  }
}
