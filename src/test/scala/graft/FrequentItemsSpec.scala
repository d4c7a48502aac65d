package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FrequentItemsSketch
import graft.operators.TextAnalysis
import graft.sources.Tables

/** Misra–Gries guarantee tests: items above the n/(k+1) threshold must
  * survive any partitioning, and reported counts must be true-count
  * lower bounds within n/(k+1). */
class FrequentItemsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Geometric item stream: item j appears ~N/2^j times, so only the
    * first few items clear the n/(k+1) heavy-hitter threshold. */
  private def skewed(n: Int): Seq[String] =
    (1 to n).map(i => s"item${java.lang.Long.numberOfTrailingZeros(i) + 1}")

  private def sketchOf(items: Seq[String], k: Int, parts: Int): Map[String, Long] = {
    import spark.implicits._
    val df = items.toDF("item").repartition(parts)
    df.agg(FrequentItemsSketch.frequentItems(col("item"), k).as("fi"))
      .select(explode(col("fi")).as("e"))
      .select(col("e.item"), col("e.count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("every item above n/(k+1) survives, counts are bounded lower bounds") {
    val items = skewed(20000)
    val n = items.size
    val k = 8
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 4, 16)) {
      val got = sketchOf(items, k, parts)
      val bound = n.toDouble / (k + 1)
      truth.foreach { case (item, c) =>
        if (c > bound) {
          assert(got.contains(item), s"heavy item $item (freq $c > $bound) missing at parts=$parts")
        }
      }
      got.foreach { case (item, est) =>
        val c = truth(item)
        assert(est <= c, s"$item over-counted: $est > $c")
        assert(est >= c - bound, s"$item under-counted past the bound: $est < $c - $bound")
      }
      assert(got.size <= k)
    }
  }

  test("null items are ignored like count(col)") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("a"), Some("b"), None).toDF("item")
    val got = df.agg(FrequentItemsSketch.frequentItems(col("item"), 4).as("fi"))
      .select(explode(col("fi")).as("e"))
      .select(col("e.item"), col("e.count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 2L, "b" -> 1L))
  }

  test("SQL registration: frequent_items works via spark.sql") {
    import spark.implicits._
    Seq("x", "x", "y").toDF("item").createOrReplaceTempView("fi_input")
    val rows = spark.sql(
      "SELECT explode(frequent_items(item, 4)) AS e FROM fi_input")
      .select(col("e.item"), col("e.count"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows === Set(("x", 2L), ("y", 1L)))
  }

  test("q52 sketch covers every q53 exact heavy hitter with consistent bounds") {
    val sketch = SparkEntry.queries("q52_frequent_tokens")(spark, sf)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val exact = SparkEntry.queries("q53_heavy_hitters")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val toks = Tables.documents(spark, sf)
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
    val n = toks.count()
    // q53's threshold is exactly the summary's guarantee line (> n/33 with
    // k=32), so EVERY exact heavy hitter must appear in the full summary
    exact.foreach { case (token, freq) =>
      assert(sketch.contains(token), s"exact heavy hitter $token missing from sketch")
      assert(sketch(token) <= freq)
      assert(sketch(token) >= freq - n / 33.0)
    }
    assert(exact.nonEmpty)
  }
}
