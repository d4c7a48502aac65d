package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._

/** Native Catalyst expression computing a fitted linear projection
  * y_j = Σ_i rows(j)(i)·(x_i − mu_i) over a vector column in one fused
  * per-row kernel — `array<double>` of length k.
  *
  * Why native: the expression-tree formulation (k×d literal
  * multiply-add nodes — 1,024 at k=16, d=64) made Catalyst re-plan and
  * re-codegen a four-digit-node tree on EVERY query; like the moment
  * aggregate it replaced ([[MomentSketch]]), the planning cost dwarfed
  * the data pass at any local scale and recurred per bench run. Here
  * the model rides the codegen references array
  * (`ctx.addReferenceObj`) and the generated code is ONE static call
  * (the [[DeflateStats]]/[[MultiMatch]] static-kernel pattern), so the
  * expression stays inside whole-stage codegen with constant planning
  * cost.
  *
  * Bit-compatibility contract: the kernel accumulates
  * `acc += w(i)·(x(i) − mu(i))` in ascending-i order — exactly the
  * left-associated order of the expression form it replaces and of the
  * plain-Scala spec twin (`Pca.projectRow`), so per-row outputs are
  * bit-identical to both (PcaSpec-gated).
  *
  * `mu`/`rows` are Seq fields (not bare arrays) so case-class equality
  * is STRUCTURAL — Catalyst's subexpression elimination then
  * recognizes the k `element_at(pca_project(...), j)` projections as
  * one shared computation instead of evaluating the kernel k times. */
case class PcaProject(child: Expression, mu: Seq[Double],
    rows: Seq[Seq[Double]]) extends UnaryExpression {

  require(rows.forall(_.length == mu.length),
    "every projection row must match the mean's width")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pca_project"

  @transient private lazy val muArr: Array[Double] = mu.toArray
  @transient private lazy val rowsArr: Array[Array[Double]] =
    rows.map(_.toArray).toArray
  // lazy: unresolved (NullType) while the Column is being constructed
  @transient private lazy val childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    PcaProject.compute(input.asInstanceOf[ArrayData], muArr, rowsArr,
      childIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val muRef = ctx.addReferenceObj("pcaMu", muArr, "double[]")
    val rowsRef = ctx.addReferenceObj("pcaRows", rowsArr, "double[][]")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.PcaProject$$.MODULE$$.compute(" +
        s"$arr, $muRef, $rowsRef, $childIsFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): PcaProject =
    copy(child = newChild)
}

object PcaProject {

  /** Shared eval/codegen kernel: y = rows · (x − mu), ascending-i
    * accumulation order (the bit-compatibility contract). */
  def compute(a: ArrayData, mu: Array[Double], rows: Array[Array[Double]],
      isFloat: Boolean): ArrayData = {
    val d = mu.length
    require(a.numElements() == d,
      s"pca_project(d=$d) got a vector of width ${a.numElements()}")
    val x = new Array[Double](d)
    var i = 0
    while (i < d) {
      // per-element null gate (same contract as MomentSketch.update):
      // getDouble on a null slot reads 0.0 and corrupts the projection
      require(!a.isNullAt(i),
        s"pca_project(d=$d) got a null element at index $i")
      x(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    val out = new Array[Double](rows.length)
    var j = 0
    while (j < rows.length) {
      val w = rows(j)
      var acc = 0.0d
      i = 0
      while (i < d) {
        acc += w(i) * (x(i) - mu(i))
        i += 1
      }
      out(j) = acc
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** `pca_project(vec)` as a Column: the fitted projection of a vector
    * column under (mu, rows) → `array<double>` of length rows.length. */
  def pca_project(vec: Column, mu: Array[Double],
      rows: Array[Array[Double]]): Column =
    shim.column(PcaProject(shim.expression(vec),
      mu.toSeq, rows.map(_.toSeq).toSeq))
}
