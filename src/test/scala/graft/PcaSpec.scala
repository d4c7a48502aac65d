package graft

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Logit, Pca}

/** q135 deterministic PCA whitening.
  *
  * Load-bearing gates: (1) the distributed moment aggregate equals a
  * plain-Scala decimal twin digit-for-digit (the determinism anchor —
  * everything downstream is driver arithmetic on that row); (2) the
  * Jacobi basis is orthonormal and satisfies the eigen equation;
  * (3) whitening actually whitens (identity covariance); (4) a planted
  * low-rank frame recovers its subspace; (5) per-row engine projection
  * equals the twin bit-for-bit.
  */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def corpus(): DataFrame =
    graft.sources.Tables.embeddings(spark, sf)

  private def collected(): Array[(Long, Array[Float])] =
    corpus().select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  /** Plain-Scala decimal moment twin (same castDecimal15 per-term
    * rounding, exact order-free decimal adds). */
  private def twinMoments(rows: Array[Array[Float]])
      : (Long, Array[Double], Array[Double]) = {
    val d = Pca.Dim
    val s = Array.fill(d)(JBigDecimal.ZERO)
    val ss = Array.fill(d * (d + 1) / 2)(JBigDecimal.ZERO)
    rows.foreach { x =>
      var i = 0
      while (i < d) {
        s(i) = s(i).add(Logit.castDecimal15(x(i).toDouble))
        i += 1
      }
      var k = 0
      for { i <- 0 until d; j <- i until d } {
        ss(k) = ss(k).add(Logit.castDecimal15(x(i).toDouble * x(j).toDouble))
        k += 1
      }
    }
    (rows.length.toLong, s.map(_.doubleValue), ss.map(_.doubleValue))
  }

  test("the distributed moment aggregate equals the decimal twin " +
    "digit-for-digit") {
    val (n, s, ss) = Pca.moments(corpus())
    val (tn, tsv, tss) = twinMoments(collected().map(_._2))
    assert(n === tn)
    assert(s.toSeq === tsv.toSeq)
    assert(ss.toSeq === tss.toSeq)
  }

  test("moment_sketch: null vectors are skipped, width mismatch refuses, " +
    "SQL registration serves the same row") {
    import spark.implicits._
    import graft.functions.MomentSketch.momentSketch
    val df = Seq(
      (1L, Some(Seq(1.0f, 2.0f))),
      (2L, None),
      (3L, Some(Seq(3.0f, 4.0f)))).toDF("vec_id", "v")
    val arr = df.agg(momentSketch(org.apache.spark.sql.functions.col("v"), 2))
      .head().getSeq[java.math.BigDecimal](0)
    // [count, s0, s1, ss00, ss01, ss11] — the null row doesn't count
    assert(arr(0).longValueExact === 2L)
    assert(arr(1).doubleValue === 4.0d) // 1 + 3
    assert(arr(2).doubleValue === 6.0d) // 2 + 4
    assert(arr(3).doubleValue === 10.0d) // 1 + 9
    assert(arr(4).doubleValue === 14.0d) // 2 + 12
    assert(arr(5).doubleValue === 20.0d) // 4 + 16
    val bad = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("vec_id", "v")
    val e = intercept[Exception] {
      bad.agg(momentSketch(org.apache.spark.sql.functions.col("v"), 2)).head()
    }
    assert(e.getMessage != null)
    df.createOrReplaceTempView("moment_vecs")
    val viaSql = spark.sql(
      "SELECT moment_sketch(v, 2) FROM moment_vecs")
      .head().getSeq[java.math.BigDecimal](0)
    assert(viaSql === arr)
  }

  test("the moment row is partition-count invariant (mergeable partials)") {
    val (n1, s1, ss1) = Pca.moments(corpus().repartition(1))
    val (n32, s32, ss32) = Pca.moments(corpus().repartition(32))
    assert(n1 === n32)
    assert(s1.toSeq === s32.toSeq)
    assert(ss1.toSeq === ss32.toSeq)
  }

  test("the Jacobi basis is orthonormal and solves the eigen equation") {
    val (nn, s, ss) = Pca.moments(corpus())
    val (_, cov) = Pca.covariance(nn, s, ss)
    val eig = Pca.jacobiEigen(cov)
    val d = Pca.Dim
    // orthonormality to 1e-12
    for { a <- 0 until d; b <- a until d } {
      val dot = (0 until d).map(i => eig(a)._2(i) * eig(b)._2(i)).sum
      val expect = if (a == b) 1.0d else 0.0d
      assert(math.abs(dot - expect) < 1e-12, s"v${a}.v${b} = $dot")
    }
    // residual ‖Σv − λv‖∞ ≤ 1e-9 and descending eigenvalues
    eig.foreach { case (lam, v) =>
      for (i <- 0 until d) {
        val sv = (0 until d).map(j => cov(i)(j) * v(j)).sum
        assert(math.abs(sv - lam * v(i)) < 1e-9)
      }
    }
    assert(eig.map(_._1).toSeq === eig.map(_._1).sortBy(-_).toSeq)
  }

  test("whitened sample covariance is the identity (top-k block)") {
    val model = Pca.fit(corpus())
    val ys = Pca.project(corpus(), model).drop("vec_id").collect()
      .map(r => Array.tabulate(Pca.TopK)(j => r.getDouble(j)))
    val n = ys.length.toDouble
    val mean = Array.tabulate(Pca.TopK)(j => ys.map(_(j)).sum / n)
    for { a <- 0 until Pca.TopK; b <- a until Pca.TopK } {
      val c = ys.map(y => (y(a) - mean(a)) * (y(b) - mean(b))).sum / n
      val expect = if (a == b) 1.0d else 0.0d
      assert(math.abs(c - expect) < 1e-6, s"whitened cov[$a][$b] = $c")
    }
  }

  test("a planted rank-2 frame recovers its subspace") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val u = Array.tabulate(Pca.Dim)(i => if (i % 2 == 0) 0.5f else -0.5f)
    val w = Array.tabulate(Pca.Dim)(i => if (i < 32) 0.25f else 0.0f)
    val rows = (0 until 400).map { id =>
      val a = rnd.nextGaussian().toFloat * 3f
      val b = rnd.nextGaussian().toFloat
      val vec = Array.tabulate(Pca.Dim)(i =>
        a * u(i) + b * w(i) + rnd.nextGaussian().toFloat * 0.001f)
      (id.toLong, vec.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val (n, s, ss) = Pca.moments(df)
    val (_, cov) = Pca.covariance(n, s, ss)
    val eig = Pca.jacobiEigen(cov)
    assert(eig(1)._1 > 100.0d * eig(2)._1,
      s"rank-2 structure not recovered: ${eig.take(4).map(_._1).mkString(",")}")
  }

  test("engine projection equals the twin per row bit-for-bit") {
    val model = Pca.fit(corpus())
    val engine = Pca.project(corpus(), model).collect()
      .map(r => (r.getLong(0),
        Array.tabulate(Pca.TopK)(j => r.getDouble(j + 1)))).toMap
    collected().foreach { case (id, x) =>
      val twin = Pca.projectRow(x, model)
      assert(engine(id).toSeq === twin.toSeq, s"vec $id")
    }
  }

  test("the staged model equals the in-flight fit bit-for-bit") {
    val staged = Pca.modelStaged(spark, sf)
    val live = Pca.fit(corpus())
    assert(staged.mu.toSeq === live.mu.toSeq)
    assert(staged.eigenvalues.toSeq === live.eigenvalues.toSeq)
    assert(staged.rows.map(_.toSeq).toSeq === live.rows.map(_.toSeq).toSeq)
    assert(staged.basis.map(_.toSeq).toSeq === live.basis.map(_.toSeq).toSeq)
    // and the entry form (staged variance-fit model + proportional
    // quota) matches the in-flight rerank with the same production fit
    val stagedVar = Pca.modelStagedByVariance(spark, sf)
    val liveVar = Pca.fitFromMomentsByVariance(Pca.moments(corpus()))
    assert(stagedVar.basis.length === liveVar.basis.length)
    assert(stagedVar.n === liveVar.n)
    val viaStaged = Pca.knnPcaRerankWith(corpus(), stagedVar, 10, 5, 0)
      .collect().map(_.toString).toSeq
    val viaLive = Pca.knnPcaRerank(corpus(), 10, 5)
      .collect().map(_.toString).toSeq
    assert(viaStaged === viaLive)
  }

  test("variance-threshold k: isotropic spectrum widens k, decaying " +
    "spectrum truncates, and the quota scales with n") {
    // the explained-variance rule on the real (near-isotropic) corpus
    // must keep >= the 60% threshold it was asked for
    val m = Pca.fitFromMomentsByVariance(Pca.moments(corpus()))
    assert(m.explainedVariance >= 0.6d,
      s"variance fit kept only ${m.explainedVariance}")
    assert(m.basis.length > Pca.TopK,
      "near-isotropic data must widen k past the fixed 16 — that was " +
        "the round-11 0.28-recall root cause")
    // proportional quota: floor at small n, fraction in the middle,
    // cap at the top
    assert(Pca.proportionalCand(100) === 50)
    assert(Pca.proportionalCand(2000) === 200)
    assert(Pca.proportionalCand(10000000) === 4096)
  }

  test("q140: merged base+delta moments equal the full corpus digit for " +
    "digit, so the refreshed model is bit-identical to a re-fit") {
    import org.apache.spark.sql.functions.col
    val full = Pca.momentDecimals(corpus())
    val base = Pca.baseMomentsStaged(spark, sf)
    val delta = Pca.momentDecimals(corpus().filter(col("vec_id") % 10 === 0))
    val merged = Pca.mergeMoments(base, delta)
    assert(merged.length === full.length)
    merged.zip(full).zipWithIndex.foreach { case ((m, f), i) =>
      assert(m.compareTo(f) === 0, s"moment field $i: $m vs $f")
    }
    val refreshed = Pca.fitFromMoments(Pca.momentsOf(merged))
    val refit = Pca.fit(corpus())
    assert(refreshed.mu.toSeq === refit.mu.toSeq)
    assert(refreshed.eigenvalues.toSeq === refit.eigenvalues.toSeq)
    assert(refreshed.rows.map(_.toSeq).toSeq === refit.rows.map(_.toSeq).toSeq)
    assert(refreshed.basis.map(_.toSeq).toSeq === refit.basis.map(_.toSeq).toSeq)
    // staged base moments are stable across reads
    val again = Pca.baseMomentsStaged(spark, sf)
    base.zip(again).foreach { case (a, b) => assert(a.compareTo(b) === 0) }
    // and the catalog entry emits one audit row per kept component
    val out = SparkEntry.queries("q140_pca_refresh")(spark, sf).collect()
    assert(out.length === Pca.TopK)
    assert(out.head.getAs[Long]("n_base") + out.head.getAs[Long]("n_delta")
      === corpus().count())
  }

  test("fitting twice is bit-identical (no hidden nondeterminism)") {
    val m1 = Pca.fit(corpus())
    val m2 = Pca.fit(corpus())
    assert(m1.mu.toSeq === m2.mu.toSeq)
    assert(m1.eigenvalues.toSeq === m2.eigenvalues.toSeq)
    assert(m1.rows.map(_.toSeq).toSeq === m2.rows.map(_.toSeq).toSeq)
  }

  test("the catalog entry projects every vector") {
    val out = SparkEntry.queries("q135_pca_whiten")(spark, sf)
    assert(out.count() === corpus().count())
    assert(out.columns.length === Pca.TopK + 1)
  }

  // ---- q136 two-stage exact-rerank kNN ---------------------------------

  private def asPairs(df: DataFrame): Seq[(Long, Long, Int, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getInt(2), r.getDouble(3))).toSeq

  test("with nCand >= corpus the rerank degrades exactly to q19 brute") {
    val exact = asPairs(graft.operators.Similarity
      .knnBrute(corpus(), nQueries = 10, k = 5))
    val twoStage = asPairs(Pca.knnPcaRerank(corpus(), nQueries = 10,
      k = 5, nCand = 600))
    assert(twoStage === exact)
  }

  test("recall@5 vs exact clears the floor at the production setting") {
    val exact = asPairs(graft.operators.Similarity
      .knnBrute(corpus(), nQueries = 10, k = 5))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = asPairs(Pca.knnPcaRerank(corpus(), nQueries = 10, k = 5))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = exact.keys.toSeq.map(q => (got(q) & exact(q)).size).sum
    val recall = hits.toDouble / (exact.size * 5)
    info(s"pca-rerank recall@5 = $recall")
    assert(recall >= 0.60, s"recall@5 $recall below floor")
  }

  test("rerank width follows the model, not the TopK default " +
    "(round-11 advice: a k=8 fit used to break with missing columns)") {
    val m8 = Pca.fit(corpus(), k = 8)
    assert(m8.basis.length === 8)
    val out = Pca.knnPcaRerankWith(corpus(), m8, nQueries = 3, k = 5,
      nCand0 = 25)
    assert(out.count() === 15)
  }

  test("the two-stage result is deterministic across runs") {
    val a = asPairs(Pca.knnPcaRerank(corpus(), nQueries = 10, k = 5))
    val b = asPairs(Pca.knnPcaRerank(corpus(), nQueries = 10, k = 5))
    assert(a === b)
  }
}
