package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + sanity per catalog query on the sf0.001 tier. The driver's
  * DuckDB oracle at sf0.01 is the deep correctness gate; these catch
  * regressions fast. */
class RelationalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  SparkEntry.catalog.foreach { q =>
    test(s"${q.name} returns rows and a stable schema") {
      val df = q.run(spark, sf)
      assert(df.columns.distinct.length === df.columns.length, "duplicate column names")
      assert(df.count() > 0, s"${q.name} returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q12 approx distinct is within 5% of exact") {
    import org.apache.spark.sql.functions._
    val approx = SparkEntry.queries("q12_approx_distinct")(spark, sf)
      .select("l_returnflag", "approx_orders").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = SparkEntry.queries("q6_distinct")(spark, sf)
      .select("l_returnflag", "d_orders").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex < 0.05, s"$k: approx $ap vs exact $ex")
    }
  }

  test("q33 approx percentiles are within 5% of the exact sort-based q31") {
    val approx = SparkEntry.queries("q33_approx_percentiles")(spark, sf)
      .collect().map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    val exact = SparkEntry.queries("q31_percentiles")(spark, sf)
      .collect().map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    exact.foreach { case (k, ex) =>
      ex.zip(approx(k)).foreach { case (e, a) =>
        assert(math.abs(a - e) / e < 0.05, s"$k: approx $a vs exact $e")
      }
    }
  }

  test("deterministic sampling is stable, near-fraction, and monotone in the fraction") {
    import org.apache.spark.sql.functions._
    import graft.operators.Sampling
    val docs = graft.sources.Tables.documents(spark, sf)
    val n = docs.count().toDouble
    val s10 = Sampling.deterministicSample(docs, col("doc_id"), 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s30 = Sampling.deterministicSample(docs, col("doc_id"), 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // stable across runs (hash-based, no RNG)
    val s10again = Sampling.deterministicSample(docs, col("doc_id"), 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s10 === s10again)
    // monotone: growing the fraction only ADDS rows (an RNG sample can't)
    assert(s10.subsetOf(s30))
    // near the requested fraction (binomial tolerance at n=500)
    assert(math.abs(s10.size / n - 0.1) < 0.05)
    assert(math.abs(s30.size / n - 0.3) < 0.07)
  }

  test("every oracle key exists in queries") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.oracleSql.keys.foreach(k => assert(qs.contains(k)))
  }
}
