package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Intervals, Profiling, Sampling, Vocab}

/** Round-4 extension operators: histogram, interval-overlap join,
  * weighted sampling, TF-IDF terms — each checked against a naive
  * single-machine formulation on data built to hit its edges. */
class ProfilingIntervalsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("histogram matches a brute-force binning, clamps max into the last bin") {
    import spark.implicits._
    val xs = Seq(0.0, 1.0, 2.5, 5.0, 9.99, 10.0) // 10.0 = max must land in bin 4, not 5
    val df = xs.zipWithIndex.map { case (x, i) => (s"g${i % 2}", x) }.toDF("g", "x")
    val got = Profiling.histogram(df, col("g"), col("x"), nBins = 5)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val lo = xs.min; val width = (xs.max - xs.min) / 5
    val expect = xs.zipWithIndex
      .map { case (x, i) => (s"g${i % 2}", math.min(((x - lo) / width).toInt, 4)) }
      .groupBy(identity).map { case (k, v) => (k._1, k._2, v.size.toLong) }.toSet
    assert(got === expect)
    assert(got.exists { case (_, bin, _) => bin == 4 }) // the clamp actually fired
  }

  test("histogram of a constant column is one bin holding every row") {
    import spark.implicits._
    val df = Seq.fill(7)(("g", 3.14)).toDF("g", "x")
    val got = Profiling.histogram(df, col("g"), col("x"), nBins = 8)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(got.toSeq === Seq(("g", 0, 7L)))
  }

  test("quantileSketch: rank error vs the true quantile is within the O(1/sqrt(k)) band") {
    val sf = "/root/testdata/sf0.01"
    val li = graft.sources.Tables.lineitem(spark, sf)
    val k = 1024
    val est = SparkEntry.queries("q95_quantile_sketch")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(est.nonEmpty)
    // exact empirical CDF at each estimate: P(x <= est) within the group
    val cdf = li.groupBy(col("l_returnflag").as("g"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    est.foreach { case (g, q, e) =>
      val below = li.filter(col("l_returnflag") === g && col("l_extendedprice") <= e)
        .count().toDouble / cdf(g)
      // 4-sigma band for a uniform k-sample quantile + 1/k discretization
      val bound = 4.0 * math.sqrt(q * (1 - q) / k) + 1.0 / k
      assert(math.abs(below - q) <= bound,
        f"group $g q=$q: empirical CDF at estimate = $below%.4f, off by more than $bound%.4f")
    }
  }

  test("quantileSketch sample MERGES: bottom-k of halves, re-cut, equals bottom-k of the whole") {
    import spark.implicits._
    // the associativity that makes the sketch shard-combinable
    val rows = (1 to 5000).map(i => ("g", i.toDouble, i.toLong))
    val df = rows.toDF("g", "x", "id")
    val k = 64
    def bottomK(d: org.apache.spark.sql.DataFrame) =
      d.withColumn("__p", md5(col("id").cast("string")))
        .orderBy("__p").limit(k)
    val whole = bottomK(df).select("id").collect().map(_.getLong(0)).toSet
    val a = bottomK(df.filter(col("id") % 2 === 0))
    val b = bottomK(df.filter(col("id") % 2 =!= 0))
    val merged = bottomK(a.unionAll(b).select("g", "x", "id"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(merged === whole)
  }

  test("quantileSketch is deterministic across runs and respects sample-size caps") {
    val sf = "/root/testdata/sf0.001"
    val r1 = SparkEntry.queries("q95_quantile_sketch")(spark, sf).collect().toSeq
    val r2 = SparkEntry.queries("q95_quantile_sketch")(spark, sf).collect().toSeq
    assert(r1 === r2)
    // n_sample = min(k, group size), never more
    r1.foreach(r => assert(r.getLong(3) <= 1024))
  }

  test("overlapSelfJoin matches the brute-force inequality join on varied-length intervals") {
    import spark.implicits._
    // deterministic pseudo-random intervals, lengths 0..5x the cell width —
    // multi-cell replication and the dedup-at-overlap-start rule both fire
    val cell = 100L
    val iv = (1 to 300).map { i =>
      val s = (i * 2654435761L) % 2000
      val len = (i * 40503L) % (5 * cell)
      (i.toLong, (i % 7).toLong, s, s + len)
    }.toDF("id", "key", "s", "e")
    val got = Intervals.overlapSelfJoin(iv, cellWidth = cell)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = iv.alias("a"); val b = iv.alias("b")
    val brute = a.join(b,
        col("a.key") === col("b.key") && col("a.id") < col("b.id") &&
        col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
      .select(col("a.key"), col("a.id"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(brute.nonEmpty)
    assert(got === brute) // exactly once each: set equality + no dups pre-set
    val n = Intervals.overlapSelfJoin(iv, cellWidth = cell).count()
    assert(n === brute.size) // no pair emitted twice
  }

  test("overlapSelfJoin bins negative (pre-epoch) coordinates correctly") {
    import spark.implicits._
    // straddle zero: truncate-toward-zero div would collapse cells -1 and
    // 0 and both manufacture and drop pairs around the origin
    val iv = (1 to 200).map { i =>
      val s = (i * 7919L) % 1000 - 500
      (i.toLong, (i % 3).toLong, s, s + (i % 250))
    }.toDF("id", "key", "s", "e")
    val got = Intervals.overlapSelfJoin(iv, cellWidth = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = iv.alias("a"); val b = iv.alias("b")
    val brute = a.join(b,
        col("a.key") === col("b.key") && col("a.id") < col("b.id") &&
        col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
      .select(col("a.key"), col("a.id"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(brute.nonEmpty)
    assert(got === brute)
    assert(Intervals.overlapSelfJoin(iv, cellWidth = 100L).count() === brute.size)
  }

  test("weightedSample selects the naive priority-window winners") {
    import spark.implicits._
    val df = (1 to 500).map(i => (s"src${i % 3}", i.toLong, (i % 50) + 1))
      .toDF("source", "doc_id", "w")
    val got = Sampling.weightedSample(df, col("source"), col("doc_id"), col("w"), k = 4)
      .select("source", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy((Sampling.hashU32(col("doc_id")).cast("double") / col("w")).asc, col("doc_id").asc)
    val naive = df.filter(col("w") > 0).withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 4)
      .select("source", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === naive)
    assert(got.size === 12)
  }

  test("weightedSample drops non-positive weights and favors heavy rows") {
    import spark.implicits._
    // one heavy row (w=1e6) among 200 light ones (w=1): the heavy row's
    // expected priority is ~1e6 smaller, so it must be selected
    val df = ((1 to 200).map(i => ("s", i.toLong, 1L)) :+ (("s", 999L, 1000000L)) :+ (("s", 1000L, 0L)))
      .toDF("source", "doc_id", "w")
    val picked = Sampling.weightedSample(df, col("source"), col("doc_id"), col("w"), k = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(picked.contains(999L))
    assert(!picked.contains(1000L)) // zero weight = never sampled
  }

  test("histogram drift is zero for proportionally identical cohorts, positive for a shift") {
    import spark.implicits._
    // cohort 0 and cohort 1 identical -> every bin has na == nb (ta == tb)
    val same = (0 until 100).flatMap(i =>
      Seq(("g", 0, (i % 10).toDouble), ("g", 1, (i % 10).toDouble)))
      .toDF("grp", "c", "x")
    val zero = Profiling.histogramDrift(same, col("grp"), col("c"), col("x"), 16)
      .select("drift_scaled").as[Long].head()
    assert(zero === 0L)
    // cohort 1 collapsed onto the top value -> mass moved across bins
    val shifted = ((0 until 100).map(i => ("g", 0, (i % 10).toDouble)) ++
      (0 until 100).map(_ => ("g", 1, 9.0)))
      .toDF("grp", "c", "x")
    val drift = Profiling.histogramDrift(shifted, col("grp"), col("c"), col("x"), 16)
      .select("drift_scaled").as[Long].head()
    // exact: 9 bins each lose 10*100, the top bin gains |10*100 - 100*100|
    assert(drift === 9L * 10 * 100 + (100L * 100 - 10L * 100))
  }

  test("tfidfTerms ranks by (tf desc, df asc, term asc) with exact counts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple banana cherry"),
      (2L, "banana banana cherry cherry date"),
      (3L, "apple date date date")).toDF("doc_id", "text")
    val got = Vocab.tfidfTerms(docs, k = 2)
      .select("doc_id", "term", "tf", "df", "rk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .toSet
    // df: apple 2, banana 2, cherry 2, date 2
    val expect = Set(
      (1L, "apple", 2L, 2L, 1), (1L, "banana", 1L, 2L, 2),
      (2L, "banana", 2L, 2L, 1), (2L, "cherry", 2L, 2L, 2),
      (3L, "date", 3L, 2L, 1), (3L, "apple", 1L, 2L, 2))
    assert(got === expect)
  }

  test("stratifiedQuota equals the naive per-stratum window; small strata return whole") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = ((1 to 40).map(i => (i.toLong, "big")) ++
      (100 to 102).map(i => (i.toLong, "small")))
      .toDF("doc_id", "lang")
    val got = Sampling.stratifiedQuota(df, col("lang"), col("doc_id"), quota = 5)
      .select("lang", "rk", "doc_id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val naive = df
      .withColumn("h", md5(col("doc_id").cast("string").cast("binary")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))))
      .filter(col("rk") <= 5)
      .select("lang", "rk", "doc_id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === naive)
    assert(got.count(_._1 == "big") === 5)
    assert(got.count(_._1 == "small") === 3) // stratum smaller than quota
  }

  test("dqAudit counts each planted violation class exactly once per bad row") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(d: Int) = new Timestamp(d * 86400000L)
    val customer = Seq((1L, "a"), (2L, "b"), (2L, "b2"), (3L, "c"))
      .toDF("c_custkey", "c_name")                     // dup key 2 -> 1 excess row
    val orders = Seq(
      (10L, 1L, ts(10)), (11L, 2L, ts(20)), (12L, 99L, ts(30))) // orphan cust 99
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val lineitem = Seq(
      (10L, 100L, 1.0, 0.05, "A", ts(12)),  // clean
      (10L, 100L, 2.0, 0.05, "A", ts(5)),   // ships before order date
      (11L, 999L, 3.0, 0.2,  "X", ts(25)),  // orphan part + bad discount + bad flag
      (77L, 100L, 0.0, 0.05, "N", ts(1)))   // orphan order + non-positive qty
      .toDF("l_orderkey", "l_partkey", "l_quantity", "l_discount",
        "l_returnflag", "l_shipdate")
    val part = Seq((100L, "p")).toDF("p_partkey", "p_name")
    val docs = Seq((1L, "abc", 3L), (2L, "", 0L), (3L, "xy", 9L))
      .toDF("doc_id", "text", "n_chars") // one empty, one n_chars lie
    val got = Profiling.dqAudit(customer, orders, lineitem, part, docs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map(
      "accepted_values:lineitem.l_returnflag" -> 1L,
      "range:lineitem.l_discount[0,0.1]" -> 1L,
      "positive:lineitem.l_quantity" -> 1L,
      "not_empty:documents.text" -> 1L,
      "consistent:documents.n_chars=length(text)" -> 1L,
      "unique:customer.c_custkey" -> 1L,
      "fk:orders.o_custkey->customer" -> 1L,
      "fk:lineitem.l_orderkey->orders" -> 1L,
      "order:lineitem.l_shipdate>=o_orderdate" -> 1L,
      "fk:lineitem.l_partkey->part" -> 1L))
  }

  test("q113 catalog entry: only the planted ship-before-order rule fires") {
    val rows = SparkEntry.queries("q113_dq_audit")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.size === 10)
    assert(rows("order:lineitem.l_shipdate>=o_orderdate") > 0)
    assert((rows - "order:lineitem.l_shipdate>=o_orderdate").values.forall(_ == 0L))
  }

  test("profileColumns: nulls, duplicates, and an all-null column fold exactly") {
    import spark.implicits._
    val df = Seq(
      (Some(1.0), Some("a"), Option.empty[Double]),
      (Some(1.0), Some("a"), Option.empty[Double]),
      (Some(2.5), None, Option.empty[Double]),
      (None, Some("b"), Option.empty[Double]))
      .toDF("x", "s", "dead")
    val got = Profiling.profileColumns(df, numeric = Seq("x", "dead"),
        other = Seq("s"))
      .collect().map(r => r.getString(0) -> (
        r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)), Option(r.get(5)), Option(r.get(6)))).toMap
    assert(got("x") === ((4L, 1L, 2L, Some(1.0), Some(2.5), Some(4.5))))
    assert(got("dead") === ((4L, 4L, 0L, None, None, None)))
    assert(got("s") === ((4L, 1L, 2L, None, None, None)))
  }

  test("profileColumns plans no Expand: the unpivot aggregate, not the m-way distinct") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.ExpandExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val out = Profiling.profileColumns(
      graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001"),
      numeric = Seq("l_quantity", "l_extendedprice"),
      other = Seq("l_returnflag"))
    out.collect()
    def allNodes(p: SparkPlan): Seq[SparkPlan] = {
      val expanded = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => Seq.empty
      }
      p +: (p.children ++ expanded).flatMap(allNodes)
    }
    val expands = allNodes(out.queryExecution.executedPlan)
      .collect { case e: ExpandExec => e }
    assert(expands.isEmpty,
      "profile plan contains Expand — the m-way distinct shape it must avoid")
  }

  test("profileColumns over a long-text column ships digests through the " +
      "exchange, never the text (r14 verdict task 7)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // documents-table shape: a body column far wider than any digest
    val docs = (1 to 50).map(i => (i.toLong, ("lorem ipsum " * 400) + i))
      .toDF("doc_id", "text")
    val out = Profiling.profileColumns(docs, numeric = Seq("doc_id"),
      other = Seq("text"))
    // correctness on the wide column first
    val row = out.filter(col("col_name") === "text").head()
    assert(row.getLong(1) === 50L && row.getLong(3) === 50L)
    def allNodes(p: SparkPlan): Seq[SparkPlan] = {
      val expanded = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => Seq.empty
      }
      p +: (p.children ++ expanded).flatMap(allNodes)
    }
    val exchanges = allNodes(out.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, "expected at least the stage-1 exchange")
    exchanges.foreach { e =>
      val names = e.output.map(_.name.toLowerCase)
      assert(names.exists(_.contains("str_h")) || !names.exists(_.contains("str")),
        s"exchange carries an un-hashed value column: $names")
      assert(!names.contains("text") && !names.exists(_.contains("str_v")),
        s"exchange schema leaks the raw text column: $names")
    }
  }
}
