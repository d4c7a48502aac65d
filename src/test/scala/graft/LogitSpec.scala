package graft

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Logit

/** q132 logistic-regression curation filter.
  *
  * The load-bearing gate is bit-exact training determinism: the
  * distributed gradient loop (decimal-cast-then-sum) must equal a
  * plain-Scala driver twin weight-for-weight — which simultaneously
  * proves the decimal trick makes the training partition-order-free
  * (the twin sums rows in table order; Spark sums partials in whatever
  * order 4 shuffle-free partitions finish). On top of that: the learned
  * model must actually RECOVER the hand rule it was trained on, and a
  * planted-separable frame must reach 100%.
  */
class LogitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Plain-Scala twin of Logit.train (IRLS): same hyperparameters, same
    * left-associated margin/term order, same StrictMath exponential,
    * same double→decimal(30,15) cast before an exact sum, same ridge
    * and 4×4 solve (shared via Logit.solve / Logit.castDecimal15). */
  private def twinTrain(rows: Seq[(Double, Double, Double, Double)],
      iters: Int, lam: Double): Array[Double] = {
    var w = Array(0.0d, 0.0d, 0.0d, 0.0d)
    for (_ <- 0 until iters) {
      val hs = Array.fill(10)(JBigDecimal.ZERO)
      val gs = Array.fill(4)(JBigDecimal.ZERO)
      rows.foreach { case (y, x1, x2, x3) =>
        val x = Array(1.0d, x1, x2, x3)
        val m = w(0) + w(1) * x1 + w(2) * x2 + w(3) * x3
        val p = 1.0d / (1.0d + StrictMath.exp(-m))
        val r = p - y
        val v = p * (1.0d - p)
        var idx = 0
        for { j <- 0 until 4; k <- j until 4 } {
          hs(idx) = hs(idx).add(Logit.castDecimal15(v * x(j) * x(k)))
          idx += 1
        }
        var j = 0
        while (j < 4) { gs(j) = gs(j).add(Logit.castDecimal15(r * x(j))); j += 1 }
      }
      val hm = Array.ofDim[Double](4, 4)
      var idx = 0
      for { j <- 0 until 4; k <- j until 4 } {
        val d = hs(idx).doubleValue; hm(j)(k) = d; hm(k)(j) = d; idx += 1
      }
      val g = Array.tabulate(4)(j => gs(j).doubleValue)
      for (j <- 0 until 4) { hm(j)(j) += lam; g(j) += lam * w(j) }
      val d = Logit.solve(hm, g)
      w = Array.tabulate(4)(j => w(j) - d(j))
    }
    w
  }

  private def collectFeatures(df: org.apache.spark.sql.DataFrame) =
    df.select("y", "x1", "x2", "x3").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toSeq

  test("distributed training equals the driver twin weight-for-weight") {
    val f = Logit.features(spark, sf)
    val dist = Logit.train(f)
    val twin = twinTrain(collectFeatures(f), Logit.Iters, Logit.Ridge)
    assert(dist.toSeq === twin.toSeq,
      s"distributed ${dist.mkString(",")} vs twin ${twin.mkString(",")}")
    // and training twice is bit-identical (no hidden nondeterminism)
    assert(Logit.train(f).toSeq === dist.toSeq)
  }

  test("the learned model recovers the hand rule it was trained on") {
    val out = SparkEntry.queries("q132_logreg_gate")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val p = r.getDouble(2)
      assert(p >= 0.0 && p <= 1.0)
      assert(r.getInt(3) === (if (p >= 0.5) 1 else 0))
    }
    val acc = out.count(r => r.getInt(1) === r.getInt(3)).toDouble / out.length
    val prior = {
      val pos = out.count(_.getInt(1) === 1).toDouble / out.length
      math.max(pos, 1 - pos)
    }
    assert(acc >= 0.99, s"rule recovery accuracy $acc < 0.99 (prior $prior)")
    assert(acc > prior, s"accuracy $acc no better than majority prior $prior")
    // non-degenerate: both classes present in label AND prediction
    assert(out.map(_.getInt(1)).distinct.length === 2)
    assert(out.map(_.getInt(3)).distinct.length === 2)
  }

  test("planted linearly-separable frame trains to 100%") {
    import spark.implicits._
    // y=1 rows have zero blocked hits, y=0 rows have many: separable on
    // x2 alone with a wide margin
    val rows = (1 to 200).map { i =>
      if (i % 2 == 0) (i.toLong, 1.0d, (i % 40 + 10) / 128.0d, 0.0d, (i % 30 + 5) / 128.0d)
      else (i.toLong, 0.0d, (i % 40 + 10) / 128.0d, (i % 5 + 8).toDouble, (i % 30 + 5) / 128.0d)
    }
    val f = rows.toDF("doc_id", "y", "x1", "x2", "x3")
    val w = Logit.train(f)
    val got = f.select(col("y"),
        (lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") +
          lit(w(3)) * col("x3") >= 0.0d).cast("int").as("pred"))
      .collect()
    val acc = got.count(r => r.getDouble(0).toInt === r.getInt(1)).toDouble / got.length
    assert(acc === 1.0, s"planted-separable accuracy $acc, w=${w.mkString(",")}")
    assert(w(2) < 0, s"blocked-hits weight should be negative, got ${w(2)}")
  }

  test("IRLS training reduces the loss") {
    val f = Logit.features(spark, sf)
    val rows = collectFeatures(f)
    def nll(w: Array[Double]): Double = rows.map { case (y, x1, x2, x3) =>
      val p = 1.0d / (1.0d + StrictMath.exp(-(w(0) + w(1) * x1 + w(2) * x2 + w(3) * x3)))
      val eps = 1e-15
      -(y * math.log(p.max(eps)) + (1 - y) * math.log((1 - p).max(eps)))
    }.sum / rows.length
    val w = Logit.train(f)
    assert(nll(w) < nll(Array(0.0, 0.0, 0.0, 0.0)) * 0.5,
      s"final NLL ${nll(w)} not well below initial ${nll(Array(0.0, 0.0, 0.0, 0.0))}")
  }
}
