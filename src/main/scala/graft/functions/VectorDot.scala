package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the dense-vector dot product.
  *
  * The composed form (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) is
  * codegen'd too, but materializes the element-product array per row and
  * walks the higher-order-function machinery; this expression emits a
  * single fused primitive loop — no allocation, no lambda dispatch —
  * which is the preference order the engine follows for hot scalar
  * kernels (compose built-ins → custom `Expression` with `doGenCode` →
  * custom physical operator).
  *
  * Semantics exactly match the composed form (and DuckDB's
  * `list_dot_product` on `DOUBLE[]`): strict left-to-right accumulation
  * of `a[i]*b[i]` in IEEE double, so results stay bit-identical across
  * engines and partitionings. Extra elements of the longer array are
  * ignored; null arrays propagate null; null *elements* are not
  * supported (embedding columns are non-null by contract). */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorDot {
  /** `vector_dot(a, b)` as a Column over two `array<double>` columns. */
  def vector_dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.shim
    shim.column(VectorDot(shim.expression(a), shim.expression(b)))
  }
}
