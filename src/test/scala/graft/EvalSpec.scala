package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Eval

/** q133 classifier evaluation (exact tie-aware ROC AUC + reliability).
  *
  * The load-bearing gates: (1) the bucket-decomposed prefix scan must
  * equal an INDEPENDENTLY-constructed plain-Scala midrank AUC (sort +
  * rank arithmetic — a different formulation than the engine's
  * cumulative-negatives sum); (2) ties must contribute exactly ½ per
  * pair (hand-computed fixture); (3) the engine plan must hold no
  * corpus-wide bare window — only the constant-bounded bucket-totals
  * window and bucket-partitioned in-bucket windows.
  */
class EvalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def frame(rows: Seq[(Int, Int, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "label", "p_keep")
  }

  private def aucOf(df: DataFrame): Double =
    Eval.aucReliability(df).select("auc").head().getDouble(0)

  /** Independent plain-Scala AUC: average midrank of the positives
    * (Mann–Whitney U / rank-sum form), NOT the engine's
    * cumulative-negatives formulation. */
  private def twinAuc(rows: Seq[(Int, Double)]): Double = {
    val sorted = rows.sortBy(_._2)
    // midranks: ties share the average of the rank block they occupy
    val ranks = new Array[Double](sorted.length)
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._2 == sorted(i)._2) j += 1
      val mid = (i + 1 + j).toDouble / 2.0d // avg of ranks i+1 .. j
      for (k <- i until j) ranks(k) = mid
      i = j
    }
    val nPos = sorted.count(_._1 == 1).toDouble
    val nNeg = sorted.length - nPos
    val rPos = sorted.indices.collect {
      case k if sorted(k)._1 == 1 => ranks(k)
    }.sum
    (rPos - nPos * (nPos + 1) / 2.0d) / (nPos * nNeg)
  }

  test("hand-computed tied AUC: cross-class tie contributes exactly 1/2") {
    // pairs: (0.2p,0.1n)=1, (0.2p,0.2n)=1/2, (0.8p,0.1n)=1, (0.8p,0.2n)=1
    // AUC = 3.5/4 = 0.875
    val df = frame(Seq((1, 0, 0.1), (2, 0, 0.2), (3, 1, 0.2), (4, 1, 0.8)))
    val out = Eval.aucReliability(df).collect()
    assert(aucOf(df) === 0.875)
    val first = out.head
    assert(first.getAs[Long]("auc_num") === 7L)
    assert(first.getAs[Long]("auc_den") === 8L)
  }

  test("perfect separation is 1.0, inverted separation is 0.0") {
    val sep = frame(Seq((1, 0, 0.1), (2, 0, 0.2), (3, 1, 0.7), (4, 1, 0.9)))
    assert(aucOf(sep) === 1.0d)
    val inv = frame(Seq((1, 1, 0.1), (2, 1, 0.2), (3, 0, 0.7), (4, 0, 0.9)))
    assert(aucOf(inv) === 0.0d)
  }

  test("arbitrary scores beyond [0,1] keep the AUC exact (round-11 " +
    "advice: the int bucket cast used to wrap and scramble the prefix)") {
    // via the graft_auc TVF the score column is arbitrary; |s|·65536
    // far past Int.MaxValue exercises the wraparound the long-domain
    // clamp removed. Out-of-range scores land in the edge buckets but
    // the in-bucket window still orders by the raw score, so the
    // engine must equal the rank-sum twin exactly.
    val rows = Seq((1, 0, -9.9e12), (2, 0, 0.25), (3, 1, 0.25),
      (4, 1, 0.75), (5, 0, 4.4e13), (6, 1, 8.8e14))
    val engine = aucOf(frame(rows))
    val twin = twinAuc(rows.map(r => (r._2, r._3)))
    assert(engine === twin, s"engine $engine vs twin $twin")
  }

  test("single-class input yields auc_den 0 and NaN, not an error") {
    val one = frame(Seq((1, 1, 0.4), (2, 1, 0.6)))
    val r = Eval.aucReliability(one).collect().head
    assert(r.getAs[Long]("auc_den") === 0L)
    assert(r.getAs[Double]("auc").isNaN)
  }

  test("engine AUC equals the plain-Scala midrank twin on the corpus") {
    val scored = operators.Logit.scored(operators.Logit.features(spark, sf))
    val rows = scored.select("label", "p_keep").collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toSeq
    val engine = aucOf(scored)
    assert(engine === twinAuc(rows),
      s"engine $engine vs twin ${twinAuc(rows)}")
    // both classes present (the contract the division needs)
    assert(rows.exists(_._1 == 1) && rows.exists(_._1 == 0))
  }

  test("reliability bins partition the corpus and respect bin bounds") {
    val scored = operators.Logit.scored(operators.Logit.features(spark, sf))
    val out = Eval.aucReliability(scored).collect()
    val total = scored.count()
    assert(out.map(_.getAs[Long]("n_docs")).sum === total)
    assert(out.map(_.getAs[Long]("n_pos")).sum ===
      out.head.getAs[Long]("n_pos_total"))
    out.foreach { r =>
      val bin = r.getAs[Int]("bin")
      assert(bin >= 0 && bin <= 9)
      // mean predicted micro-probability sits inside (or at the edge
      // rounding of) its decile
      val mean = r.getAs[Long]("sum_p_u").toDouble / 1e6 /
        r.getAs[Long]("n_docs")
      assert(mean >= bin / 10.0 - 1e-6 && mean <= (bin + 1) / 10.0 + 1e-6,
        s"bin $bin mean $mean")
    }
  }

  test("the trained gate ranks its own training labels perfectly") {
    // LogitSpec proves 100% threshold accuracy at 0.5; perfect accuracy
    // at a single threshold implies every positive scores above every
    // negative, i.e. AUC == 1.0 exactly
    val scored = operators.Logit.scored(operators.Logit.features(spark, sf))
    assert(aucOf(scored) === 1.0d)
  }

  test("no corpus-wide bare window: every Window is bucket-partitioned " +
    "except the constant-bounded bucket-totals frame") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val scored = operators.Logit.scored(operators.Logit.features(spark, sf))
    val windows = Eval.aucReliability(scored)
      .queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.nonEmpty)
    val bare = windows.filter(_.partitionSpec.isEmpty)
    // exactly one unpartitioned window is allowed: the bucket-totals
    // exclusive prefix, whose input is the <= 65,537-row totals frame
    // (grouped by bucket id b, column bneg) — never documents, never
    // the distinct-score table
    assert(bare.size === 1, s"bare windows: ${bare.map(_.simpleString(5))}")
    val childCols = bare.head.child.output.map(_.name).toSet
    assert(childCols.contains("bneg") && !childCols.contains("s"),
      s"the bare window is not over the bucket-totals frame: $childCols")
  }

  test("oracle SQL is registered after the entry runs (staged convention)") {
    SparkEntry.queries("q133_gate_eval")(spark, sf).collect()
    assert(SparkEntry.oracleSql.contains("q133_gate_eval"))
    assert(SparkEntry.oracleSql("q133_gate_eval").contains("read_parquet"))
  }

  test("q141 divergence audit: per-language counts are internally " +
    "consistent and cover the corpus") {
    val out = SparkEntry.queries("q141_gate_divergence")(spark, sf).collect()
    assert(out.nonEmpty)
    val scored = operators.Logit.scored(operators.Logit.features(spark, sf))
    assert(out.map(_.getAs[Long]("n_docs")).sum === scored.count())
    out.foreach { r =>
      val (n, rule, model, mOnly, rOnly) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_rule_keep"), r.getAs[Long]("n_model_keep"),
        r.getAs[Long]("n_model_only"), r.getAs[Long]("n_rule_only"))
      // keep sets decompose: model = (rule ∩ model) + model-only, and
      // rule = (rule ∩ model) + rule-only ⇒ model − mOnly == rule − rOnly
      assert(model - mOnly === rule - rOnly, r.toString)
      assert(mOnly >= 0 && rOnly >= 0 && model <= n && rule <= n)
    }
    // LogitSpec proves 100% rule recovery, so divergence is zero HERE —
    // the audit's value is the continuous monitoring shape, and the
    // decomposition identity above is what a diverged model would trip
    assert(out.map(_.getAs[Long]("n_model_only")).sum === 0L)
    assert(out.map(_.getAs[Long]("n_rule_only")).sum === 0L)
    assert(SparkEntry.oracleSql("q141_gate_divergence").contains("read_parquet"))
  }

  // ---- q137 dedup recall evaluation ------------------------------------

  test("confusion counts are exact on a crafted truth/candidate pair") {
    import spark.implicits._
    val truth = Seq((1L, 2L, 1.0), (3L, 4L, 0.75), (5L, 6L, 0.82))
      .toDF("doc_a", "doc_b", "jaccard")
    val approx = Seq((1L, 2L), (5L, 6L)).toDF("doc_a", "doc_b")
    val r = Eval.dedupRecallEval(truth, approx).collect().head
    assert(r.getAs[Long]("n_true") === 3L)
    assert(r.getAs[Long]("n_hit") === 2L)
    assert(r.getAs[Long]("n_missed") === 1L)
    assert(r.getAs[Long]("n_found") === 2L)
    assert(r.getAs[Long]("j_missed_max_u") === 750000L)
  }

  test("a fully-caught truth set reports -1 for the missed maximum") {
    import spark.implicits._
    val truth = Seq((1L, 2L, 0.9)).toDF("doc_a", "doc_b", "jaccard")
    val approx = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val r = Eval.dedupRecallEval(truth, approx).collect().head
    assert(r.getAs[Long]("n_missed") === 0L)
    assert(r.getAs[Long]("j_missed_max_u") === -1L)
  }

  test("on the corpus the under-banded LSH is a subset of the exact truth") {
    val r = SparkEntry.queries("q137_dedup_recall_eval")(spark, sf)
      .collect().head
    val (nTrue, nHit, nMissed, nFound) =
      (r.getAs[Long]("n_true"), r.getAs[Long]("n_hit"),
        r.getAs[Long]("n_missed"), r.getAs[Long]("n_found"))
    assert(nHit + nMissed === nTrue)
    // precision 1: every found pair is a true pair (both sides verify
    // exactly at the same τ; a shingle-hash collision would break this)
    assert(nFound === nHit)
    assert(nTrue > 0L)
    // the under-banding is the POINT — recall must be high but the
    // audit only means something if the machinery can count misses
    // (the planted tests above prove the counting; the corpus may or
    // may not have borderline pairs at this tier)
    assert(nHit.toDouble / nTrue >= 0.5, s"recall collapsed: $nHit/$nTrue")
    assert(SparkEntry.oracleSql("q137_dedup_recall_eval")
      .contains("read_parquet"))
  }
}
