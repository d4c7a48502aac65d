package graft.operators

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Query
import graft.sources.Tables

/** Trained logistic-regression curation filter — the learned twin of the
  * hand-thresholded q129 gate, and the second learned filter next to the
  * multinomial NB classifier (q115): a production pipeline starts from a
  * hand rule, collects its decisions as weak supervision, and trains a
  * model that generalizes the rule over features the rule never saw.
  * Here the label IS the q129 decision (blocked density ≤ 12%, computed
  * as the exact integer cross-multiplication `100·hits ≤ 12·tokens`), so
  * the training data is linearly separable in the count features and the
  * spec can gate that gradient descent actually RECOVERS the rule.
  *
  * Scale design — deterministic distributed training:
  *   - ONE feature-extraction map pass (token counts via the q129/q131
  *     machinery, all integer-derived, exactly representable doubles),
  *     persisted; T Newton/IRLS steps are T single-stage aggregates over
  *     it — O(T) jobs independent of corpus size, the q114/q102 shape,
  *     and nothing row-sized ever reaches the driver (each step collects
  *     ONE 14-decimal row: the symmetric 4×4 Hessian's upper triangle
  *     plus the gradient; the 4×4 solve is driver arithmetic).
  *   - Bit-exact determinism at any parallelism: per-row gradient terms
  *     are doubles (fixed evaluation order inside codegen), but they are
  *     cast to `DECIMAL(30,15)` BEFORE the sum — Spark's double→decimal
  *     cast rounds the shortest decimal representation HALF_UP (the q63
  *     lesson), which a driver twin reproduces with
  *     `BigDecimal.valueOf(d).setScale(15, HALF_UP)` — and decimal
  *     addition is exact and order-free, so partial-aggregation order
  *     (32 partitions or 32,000) cannot perturb a single training step.
  *     A plain double sum would make the learned weights
  *     partition-count-dependent; LogitSpec proves the distributed loop
  *     equals the driver-twin loop weight-for-weight.
  *   - Feature scaling divides by 128 (a binary power, exact), so the
  *     features stay exactly representable and the separating direction
  *     `15.36·x_tokens − x_blocked` stays linear in the scaled space.
  */
object Logit {

  /** IRLS hyperparameters: fixed, part of the operator's contract (the
    * spec's twin mirrors them). Ridge λ keeps the Newton system
    * nonsingular once the separable data drives the weights large. */
  val Iters = 12
  val Ridge = 1e-3

  /** Per-document training frame: (doc_id, y, x1, x2, x3) with
    * y = the q129 keep decision as exact integer arithmetic, and
    * integer-derived features scaled by the exact binary factor 1/128:
    * x1 = tokens/128, x2 = blocked hits, x3 = distinct tokens/128. */
  def features(spark: SparkSession, dir: String): DataFrame =
    featuresOf(Tables.rebalanced(Tables.documents(spark, dir)))

  /** As [[features]] over an arbitrary `(doc_id, text)` frame — the
    * stress suite's entry point. */
  def featuresOf(docs: DataFrame): DataFrame = {
    val t = TextAnalysis.tokens(col("text"))
    val hits = TextAnalysis.blocklistHits(col("text"), TextAnalysis.blocklist)
    docs
      .select(col("doc_id"), size(t).as("nt"), hits.as("nb"),
        size(array_distinct(t)).as("nd"))
      .select(col("doc_id"),
        when(col("nb") * 100 <= col("nt") * 12, 1.0d).otherwise(0.0d).as("y"),
        (col("nt").cast("double") / 128.0d).as("x1"),
        col("nb").cast("double").as("x2"),
        (col("nd").cast("double") / 128.0d).as("x3"))
  }

  /** Score a pre-featurized frame under FIXED weights — the projection
    * the trained entry and the streaming deployment twin share (all
    * expressions stateless, so the same plan runs on a micro-batch). */
  def scoreWith(f: DataFrame, w: Array[Double]): DataFrame =
    f.select(col("doc_id"), col("y").cast("int").as("label"),
      prob(w).as("p_keep"),
      (prob(w) >= 0.5d).cast("int").as("pred"))

  /** Train on `f` and score every row with the learned model — the
    * entry's body, shared with the stress suite. */
  def scored(f: DataFrame): DataFrame = scoreWith(f, train(f))

  /** The margin w·x in a FIXED left-associated evaluation order — the
    * driver twin mirrors this order exactly, so per-row doubles are
    * bit-identical between the engine and the twin. */
  private def margin(w: Array[Double]): Column =
    lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") +
      lit(w(3)) * col("x3")

  /** σ(w·x) with the twin's exact operation order. The exponential is
    * [[graft.functions.StrictExp]], NOT Spark's `exp`: `Math.exp` may
    * differ from fdlibm by 1 ulp depending on JIT tier, which would
    * make the "deterministic training" contract silently
    * warm-up-dependent; `StrictMath.exp` is bit-specified everywhere. */
  private def prob(w: Array[Double]): Column =
    lit(1.0d) / (lit(1.0d) +
      graft.functions.StrictExp.strict_exp(-margin(w)))

  /** Distributed IRLS (Newton's method): T single-stage aggregates over
    * the persisted feature frame, each shipping ONE 14-decimal row to
    * the driver — the 10 unique entries of the symmetric 4×4 Hessian
    * `Σ p(1−p)·x xᵀ` plus the 4-entry gradient `Σ (p−y)·x` — where the
    * driver adds the ridge, solves the 4×4 system ([[solve]], shared
    * verbatim with the spec twin) and broadcasts the next weights back
    * as plan literals. Plain batch gradient descent needs hundreds of
    * passes to carve a minority-class boundary out of imbalanced
    * separable data; Newton gets there in ~10, and the per-step cost is
    * the same single map-side-combining aggregate. Returns the final
    * weight vector. */
  def train(feats: DataFrame, iters: Int = Iters,
      lam: Double = Ridge): Array[Double] = {
    val f = feats.persist()
    try {
      require(f.head(1).nonEmpty, "logit training needs a non-empty feature frame")
      var w = Array(0.0d, 0.0d, 0.0d, 0.0d)
      val xs: IndexedSeq[Column] =
        IndexedSeq(lit(1.0d), col("x1"), col("x2"), col("x3"))
      for (_ <- 0 until iters) {
        val p = prob(w)
        val r = p - col("y")
        val v = p * (lit(1.0d) - p)
        def dec(c: Column) = sum(c.cast("decimal(30,15)"))
        val hAggs = for { j <- 0 until 4; k <- j until 4 }
          yield dec(v * xs(j) * xs(k)).as(s"h$j$k")
        val gAggs = (0 until 4).map(j => dec(r * xs(j)).as(s"g$j"))
        val aggs = hAggs ++ gAggs
        val row = f.agg(aggs.head, aggs.tail: _*).head()
        val hm = Array.ofDim[Double](4, 4)
        var idx = 0
        for { j <- 0 until 4; k <- j until 4 } {
          val d = row.getDecimal(idx).doubleValue
          hm(j)(k) = d; hm(k)(j) = d
          idx += 1
        }
        val g = Array.tabulate(4)(j => row.getDecimal(10 + j).doubleValue)
        for (j <- 0 until 4) {
          hm(j)(j) += lam
          g(j) += lam * w(j)
        }
        val d = solve(hm, g)
        w = Array.tabulate(4)(j => w(j) - d(j))
      }
      w
    } finally { f.unpersist() }
  }

  /** 4×4 Gaussian elimination with partial pivoting — pure doubles in a
    * FIXED operation order, shared verbatim between the distributed
    * loop and the spec's driver twin so the Newton update cannot drift
    * between them. Mutates neither argument. */
  def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    val m = Array.tabulate(n, n + 1)((r, c) => if (c < n) a(r)(c) else b(r))
    for (c <- 0 until n) {
      var piv = c
      for (r2 <- c + 1 until n) if (math.abs(m(r2)(c)) > math.abs(m(piv)(c))) piv = r2
      val t = m(c); m(c) = m(piv); m(piv) = t
      for (r2 <- c + 1 until n) {
        val fac = m(r2)(c) / m(c)(c)
        for (k <- c to n) m(r2)(k) -= fac * m(c)(k)
      }
    }
    val x = new Array[Double](n)
    for (r2 <- n - 1 to 0 by -1) {
      var s = m(r2)(n)
      for (k <- r2 + 1 until n) s -= m(r2)(k) * x(k)
      x(r2) = s / m(r2)(r2)
    }
    x
  }

  /** The twin's double→decimal(30,15) cast: Spark rounds the shortest
    * decimal representation HALF_UP (`Decimal(double)` is
    * `BigDecimal.valueOf`), exposed for LogitSpec's driver loop. */
  def castDecimal15(d: Double): JBigDecimal =
    JBigDecimal.valueOf(d).setScale(15, RoundingMode.HALF_UP)

  val queries: Seq[Query] = Seq(
    Query(
      "q132_logreg_gate",
      "Trained logistic-regression curation filter: the q129 keep rule " +
        "re-learned from its own decisions by deterministic distributed " +
        "IRLS (Newton) — one persisted integer-feature map pass, then " +
        "12 single-stage Hessian+gradient aggregates (O(T) jobs at any " +
        "corpus size; plain GD needs hundreds of passes on imbalanced " +
        "separable data) whose per-row terms are cast to DECIMAL(30,15) " +
        "before the sum and whose exponential is StrictMath-pinned, " +
        "making every training step exact, order-free, and JIT-tier-" +
        "independent: the learned weights are bit-identical at any " +
        "partition count and equal the plain-Scala twin weight-for-" +
        "weight (LogitSpec, which also gates 100% rule recovery and a " +
        "planted-separable 100%). Output: per-doc label, learned " +
        "keep-probability, prediction.",
      (s, dir) => scored(features(s, dir)).orderBy("doc_id"))
  )
}
