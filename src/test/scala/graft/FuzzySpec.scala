package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Fuzzy

/** q111 — edit-distance similarity join. The oracle proves the catalog
  * entry against DuckDB's brute-force levenshtein join; this spec
  * proves the candidate scheme itself is lossless on crafted edit
  * shapes (insert / delete / substitute / mixed at k=2) by comparing
  * against a Spark-side brute-force join on the same frame. */
class FuzzySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def frame(names: Seq[String]) = {
    import spark.implicits._
    names.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("id", "name")
  }

  private def brute(names: Seq[String], k: Int): Set[(Long, Long, Int)] = {
    val df = frame(names)
    val a = df.alias("a"); val b = df.alias("b")
    a.join(b, col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.name"), col("b.name")).as("d"))
      .filter(col("d") <= k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  private def viaJoin(names: Seq[String], k: Int): Set[(Long, Long, Int)] =
    Fuzzy.editJoin(frame(names), k)
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  private val crafted = Seq(
    "kitten", "sitten", "sittin", "sitting", // substitute / insert chain
    "kitte",                                 // delete
    "ktiten",                                // transposition = 2 edits
    "mitten", "mittens",
    "abc", "abd", "bc", "abcd", "xbc",
    "", "a", "b",                            // empty + singletons
    "same", "same2",                         // shared prefix insert
    "totallyunrelatedstring")

  test("k=1: deletion-neighborhood join equals brute force on crafted edits") {
    assert(viaJoin(crafted, 1) === brute(crafted, 1))
    assert(viaJoin(crafted, 1).nonEmpty)
  }

  test("k=2: depth-2 neighborhood equals brute force (incl. transpositions)") {
    val got = viaJoin(crafted, 2)
    assert(got === brute(crafted, 2))
    // the transposed pair is a genuine 2-edit match the k=1 pass must miss
    val kitten = crafted.indexOf("kitten").toLong
    val ktiten = crafted.indexOf("ktiten").toLong
    assert(got.contains((kitten, ktiten, 2)))
    assert(!viaJoin(crafted, 1).contains((kitten, ktiten, 2)))
  }

  test("duplicate names pair at distance 0 exactly once") {
    val names = Seq("dup", "dup", "dup2")
    val got = viaJoin(names, 1)
    assert(got === brute(names, 1))
    assert(got.count { case (a, b, d) => d == 0 } === 1)
  }

  test("catalog entry finds one-digit-apart customer names at sf0.001") {
    val out = SparkEntry.queries("q111_edit_join")(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(2) <= 1))
    // spot-check a known pair: Customer#...0 vs Customer#...1 differ in one digit
    assert(rows.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L))
  }
}
