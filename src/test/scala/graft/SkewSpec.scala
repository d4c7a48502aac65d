package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew
import graft.sources.Tables

/** Salting must be semantically invisible: salted results equal plain
  * results on real and deliberately-skewed data. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("saltedAggregate equals the plain aggregate on a hot-key distribution") {
    import spark.implicits._
    // 10k rows where 90% share one key — the classic stuck-reducer shape
    val rows = (1 to 10000).map(i => (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toLong))
    val df = rows.toDF("k", "v")
    val salted = Skew.saltedAggregate(df, col("k"), col("v"), nSalts = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === plain)
  }

  test("saltedJoin equals the plain inner join, including duplicate keys") {
    import spark.implicits._
    val probe = Seq((1, "a"), (1, "b"), (2, "c"), (3, "d"), (3, "e"), (3, "f"))
      .toDF("pk", "pv")
    val build = Seq((1, "x"), (3, "y"), (3, "z"), (4, "w")).toDF("bk", "bv")
    val salted = Skew.saltedJoin(probe, build, "pk", "bk", nSalts = 4)
      .select("pk", "pv", "bk", "bv")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getString(3))).toSeq.sorted
    val plain = probe.join(build, probe("pk") === build("bk"))
      .select("pk", "pv", "bk", "bv")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getString(3))).toSeq.sorted
    assert(salted === plain)
    assert(plain.nonEmpty)
  }

  test("groupTopKVar raises on a mixed quota even when every smaller-quota row is cut") {
    import spark.implicits._
    // ONE salt cell: five rows sorted first carry quota 10, three rows
    // sorted after them carry quota 2 — stage 1 cuts all the quota-2
    // rows (rank 6..8 > 2), so a survivor-only check would see a
    // uniform quota and silently emit a wrong top-k; the pre-cut
    // per-cell extremes must surface the mix as a hard error.
    val rows = (1 to 5).map(i => ("g", i, 10)) ++ (6 to 8).map(i => ("g", i, 2))
    val df = rows.toDF("k", "v", "quota")
    val ex = intercept[Exception] {
      Skew.groupTopKVar(df, col("k"), Seq(col("v").asc), Seq(col("v")),
        col("quota"), nSalts = 1).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("not constant within group")),
      s"expected the quota-mix error, got: ${messages(ex).mkString(" | ")}")
  }

  test("groupTopKVar with a group-constant quota is unchanged by the pre-cut check") {
    import spark.implicits._
    val rows = (1 to 20).map(i => (s"g${i % 3}", i, 4))
    val df = rows.toDF("k", "v", "quota")
    val got = Skew.groupTopKVar(df, col("k"), Seq(col("v").asc), Seq(col("v")),
        col("quota"), nSalts = 4)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (k, g) =>
      g.map(_._2).sorted.take(4).map(k -> _)
    }.toSet
    assert(got === expected)
  }

  test("rowSalt spreads bit-identical hot-key rows over multiple salts") {
    import spark.implicits._
    // every row identical: a content-only salt would collapse to ONE
    // sub-group and the skew would survive salting entirely
    val df = Seq.fill(1000)(("hot", 1L)).toDF("k", "v")
    val salts = df.select(Skew.rowSalt(df, 8).as("s"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(salts.size >= 2)
    // and the salted aggregate still merges to the plain result
    val salted = Skew.saltedAggregate(df, col("k"), col("v"), nSalts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === Set(("hot", 1000L, 1000L)))
  }

  test("q24_salted_agg runs over testdata with stable results") {
    val r1 = SparkEntry.queries("q24_salted_agg")(spark, sf).collect()
    val r2 = SparkEntry.queries("q24_salted_agg")(spark, sf).collect()
    assert(r1.map(_.toString).toSeq === r2.map(_.toString).toSeq) // deterministic salts
    val plain = Tables.lineitem(spark, sf).groupBy("l_returnflag")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    r1.foreach(r => assert(r.getAs[Long]("n") === plain(r.getAs[String]("l_returnflag"))))
  }
}
