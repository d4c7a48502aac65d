package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Testdata-drift canary (round-6 postmortem). The driver regenerates
  * `/root/testdata` between rounds and has already changed a physical
  * column type once (`events.ts`: INT64 TIMESTAMP(NANOS) → timestamp[us]
  * on 2026-08-13), which silently broke 7 catalog queries, 13 tests, and
  * the whole driver bench. This spec pins the POST-NORMALIZATION schema
  * every operator relies on, table by table, so the next regeneration
  * turns into one pinpointing failure that names the offending file
  * instead of a cascading red wall.
  *
  * Footer-only checks (schema + one limit(1) scan per table) — runs in
  * seconds at sf0.01.
  */
class TestdataCanarySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  private def fieldType(table: String, df: org.apache.spark.sql.DataFrame,
                        col: String): DataType = {
    assert(df.columns.contains(col),
      s"$dir/$table.parquet: column `$col` missing — driver regenerated the " +
        s"table with a new shape; present: ${df.columns.mkString(", ")}")
    df.schema(col).dataType
  }

  private def expect(table: String, df: org.apache.spark.sql.DataFrame,
                     cols: (String, DataType)*): Unit =
    cols.foreach { case (c, t) =>
      val actual = fieldType(table, df, c)
      assert(actual == t,
        s"$dir/$table.parquet: `$c` loads as $actual, operators expect $t — " +
          "driver regenerated the table with a new physical type; adapt the " +
          "loader in graft.sources.Tables (see Tables.events for the pattern)")
    }

  test("events normalizes to epoch-nano LongType ts regardless of physical type") {
    val ev = Tables.events(spark, dir)
    expect("events", ev,
      "event_id" -> LongType, "ts" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)
    // Value sanity, not just type: epoch nanos for any plausible test era
    // (2000-01-01 .. 2100-01-01). A loader bug that produced micros or
    // millis would land ~3 or ~6 orders of magnitude below this band.
    val row = ev.selectExpr("min(ts)", "max(ts)").head()
    val (lo, hi) = (row.getLong(0), row.getLong(1))
    val y2000 = 946684800L * 1000000000L
    val y2100 = 4102444800L * 1000000000L
    assert(lo >= y2000 && hi < y2100,
      s"events.ts range [$lo, $hi] is outside the epoch-NANOSECOND band " +
        s"[$y2000, $y2100) — the ts normalization in Tables.events is " +
        "producing the wrong unit for the current physical type")
  }

  test("documents carries the text-pipeline columns") {
    expect("documents", Tables.documents(spark, dir),
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType)
  }

  test("embeddings carries float vectors of one consistent width") {
    val emb = Tables.embeddings(spark, dir)
    expect("embeddings", emb,
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType)
    val widths = emb.selectExpr("min(size(embedding))", "max(size(embedding))").head()
    assert(widths.getInt(0) == widths.getInt(1) && widths.getInt(0) > 0,
      s"embedding vectors are ragged (widths ${widths.getInt(0)}..${widths.getInt(1)}) — " +
        "ANN operators assume one fixed dimensionality")
  }

  test("relational tables keep their key/measure columns and types") {
    expect("region", Tables.region(spark, dir),
      "r_regionkey" -> IntegerType, "r_name" -> StringType)
    expect("nation", Tables.nation(spark, dir),
      "n_nationkey" -> IntegerType, "n_name" -> StringType, "n_regionkey" -> IntegerType)
    expect("customer", Tables.customer(spark, dir),
      "c_custkey" -> LongType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType)
    expect("supplier", Tables.supplier(spark, dir),
      "s_suppkey" -> LongType, "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)
    expect("part", Tables.part(spark, dir),
      "p_partkey" -> LongType, "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType)
    expect("orders", Tables.orders(spark, dir),
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType)
    expect("lineitem", Tables.lineitem(spark, dir),
      "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_returnflag" -> StringType,
      "l_linestatus" -> StringType)
    // Dates: accept either date or timestamp physical types (operators
    // only compare/extract), but they must be temporal, not string/int.
    Seq("orders" -> ("o_orderdate", Tables.orders(spark, dir)),
        "lineitem" -> ("l_shipdate", Tables.lineitem(spark, dir))).foreach {
      case (t, (c, df)) =>
        val dt = fieldType(t, df, c)
        assert(dt == DateType || dt == TimestampType || dt == TimestampNTZType,
          s"$dir/$t.parquet: `$c` loads as $dt, expected a temporal type")
    }
  }
}
