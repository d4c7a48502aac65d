package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorDot.vector_dot
import graft.operators.Similarity
import graft.sources.Tables

/** Native VectorDot expression: bit-parity with the composed HOF form,
  * null behavior, codegen path. */
class VectorDotSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("vector_dot is bit-identical to the composed zip_with/aggregate fold") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val both = e.select(
      vector_dot(col("v"), col("v")).as("native"),
      Similarity.dotComposed(col("v"), col("v")).as("composed"))
    // bit-exact equality, all 500 rows
    assert(both.filter(col("native") =!= col("composed")).count() === 0)
    assert(both.filter(col("native").isNull).count() === 0)
  }

  test("vector_dot null and length semantics") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0, 6.0))),
      (None, Some(Seq(1.0))),
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0)))) // length mismatch: extra ignored
      .toDF("a", "b")
    val out = df.select(vector_dot(col("a"), col("b")).as("d")).collect()
    assert(out(0).getDouble(0) === 32.0)
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0) === 3.0)
  }

  test("vector_dot participates in whole-stage codegen") {
    val e = Tables.embeddings(spark, sf)
      .select(col("embedding").cast("array<double>").as("v"))
      .select(vector_dot(col("v"), col("v")).as("d"))
    e.collect() // materialize so AQE finalizes the physical plan
    val plan = e.queryExecution.executedPlan.toString
    // codegen'd stages render with a "*(stageId)" prefix; the projection
    // evaluating vector_dot must carry it (i.e. not fall back to eval)
    assert(plan.linesIterator.exists(l => l.contains("vector_dot") && l.contains("*(")),
      s"vector_dot not inside a codegen stage:\n$plan")
  }
}
