package graft

import java.math.{BigDecimal => JBigDecimal}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dsir, Logit}

/** q134 DSIR importance-resampling selection.
  *
  * Load-bearing gates: (1) the distributed weight table must equal an
  * INDEPENDENTLY-constructed plain-Scala/plain-Java twin (MessageDigest
  * md5, StrictMath logs, decimal-cast-then-sum) digit-for-digit — which
  * simultaneously proves the decimal trick makes the weights
  * partition-order-free; (2) a planted frame where the target slice is
  * about one token family must select exactly the matching raw docs;
  * (3) selection must plan as TakeOrdered (constant k, no corpus
  * window) and the λ join as a broadcast.
  */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  // ---- the independent twin ------------------------------------------

  private def twinTokens(text: String): Array[String] =
    text.toLowerCase.replaceAll("\\s+", " ").trim.split(" ")

  private def twinGrams(text: String): Seq[String] = {
    val t = twinTokens(text)
    val bi = if (t.length >= 2) t.sliding(2).map(_.mkString(" ")).toSeq
    else Seq.empty
    t.toSeq ++ bi
  }

  private def twinBucket(gram: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(gram.getBytes(StandardCharsets.UTF_8))
    val hex = d.map(b => f"$b%02x").mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16) % Dsir.Buckets
  }

  /** Full plain-Scala DSIR weight recompute over collected docs. */
  private def twinWeights(docs: Seq[(Long, Boolean, String)])
      : Map[Long, JBigDecimal] = {
    val counts = docs.flatMap { case (id, tgt, text) =>
      twinGrams(text).map(g => ((id, tgt, twinBucket(g)), 1L))
    }.groupBy(_._1).map { case (k, v) => (k, v.map(_._2).sum) }
    val ct = new Array[Long](Dsir.Buckets)
    val cr = new Array[Long](Dsir.Buckets)
    counts.foreach { case ((_, tgt, b), n) =>
      if (tgt) ct(b.toInt) += n else cr(b.toInt) += n
    }
    val logZt = StrictMath.log(ct.sum.toDouble + Dsir.Buckets)
    val logZr = StrictMath.log(cr.sum.toDouble + Dsir.Buckets)
    val lam = Array.tabulate(Dsir.Buckets) { b =>
      (StrictMath.log(ct(b).toDouble + 1.0d) - logZt) -
        (StrictMath.log(cr(b).toDouble + 1.0d) - logZr)
    }
    counts.toSeq.collect { case ((id, false, b), n) => (id, b, n) }
      .groupBy(_._1)
      .map { case (id, terms) =>
        var acc = JBigDecimal.ZERO
        // engine partial-aggregation order is arbitrary — the decimal
        // sum makes any order exact, so table order here is fine
        terms.sortBy(_._2).foreach { case (_, b, n) =>
          acc = acc.add(Logit.castDecimal15(n.toDouble * lam(b.toInt)))
        }
        (id, acc)
      }
  }

  private def corpusDocs(): Seq[(Long, Boolean, String)] =
    graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1) == "en", r.getString(2))).toSeq

  // ---- gates -----------------------------------------------------------

  test("distributed weights equal the plain-Java/Scala twin digit-for-digit") {
    val root = Dsir.weightsStaged(spark, sf)
    val engine = spark.read.parquet(root)
      .select("doc_id", "w").collect()
      .map(r => (r.getLong(0), r.getDecimal(1))).toMap
    val twin = twinWeights(corpusDocs())
    assert(engine.keySet === twin.keySet)
    engine.foreach { case (id, w) =>
      assert(w.compareTo(twin(id)) === 0,
        s"doc $id: engine $w vs twin ${twin(id)}")
    }
    assert(engine.nonEmpty)
  }

  test("weights are deterministic across independent recomputes") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
    def weights(): Map[Long, JBigDecimal] = {
      val gb = Dsir.gramBuckets(docs, col("lang") === "en")
      Dsir.docWeights(gb, Dsir.bucketLogRatios(spark, gb))
        .as[(Long, JBigDecimal)].collect().toMap
    }
    val a = weights(); val b = weights()
    assert(a.keySet === b.keySet)
    a.foreach { case (id, w) => assert(w.compareTo(b(id)) === 0) }
  }

  test("planted target vocabulary selects exactly the matching raw docs") {
    import spark.implicits._
    val target = (0L until 8L).map(i =>
      (i, true, "alpha beam alpha beam alpha signal alpha beam"))
    val rawAlpha = (100L until 104L).map(i =>
      (i, false, "alpha beam alpha signal alpha beam noise"))
    val rawGamma = (200L until 204L).map(i =>
      (i, false, "gamma delta gamma delta gamma delta gamma"))
    val docs = (target ++ rawAlpha ++ rawGamma)
      .toDF("doc_id", "is_tgt", "text")
    val gb = Dsir.gramBuckets(docs, col("is_tgt"))
    val w = Dsir.docWeights(gb, Dsir.bucketLogRatios(spark, gb))
      .withColumn("w_u", lit(0L))
    val picked = Dsir.selectTopK(w, k = 4).collect().map(_.getLong(0)).toSet
    assert(picked === rawAlpha.map(_._1).toSet,
      s"selected $picked")
    // and the target slice never appears in the weight table at all
    val ids = w.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === (rawAlpha ++ rawGamma).map(_._1).toSet)
  }

  test("selection plans as TakeOrdered and the λ join broadcasts") {
    val root = Dsir.weightsStaged(spark, sf)
    val sel = Dsir.selectTopK(spark.read.parquet(root))
    val plan = sel.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrdered top-k:\n$plan")
    assert(!plan.contains("WindowExec"))
    val docs = graft.sources.Tables.documents(spark, sf)
    val gb = Dsir.gramBuckets(docs, col("lang") === "en")
    val wPlan = Dsir.docWeights(gb, Dsir.bucketLogRatios(spark, gb))
      .queryExecution.executedPlan.toString
    assert(wPlan.contains("BroadcastHashJoin"),
      s"λ join must broadcast:\n$wPlan")
  }

  test("oracle SQL is registered after the entry runs (staged convention)") {
    val out = SparkEntry.queries("q134_dsir_select")(spark, sf).collect()
    assert(out.length === math.min(Dsir.SelectK,
      spark.read.parquet(Dsir.weightsStaged(spark, sf)).count()).toInt)
    assert(SparkEntry.oracleSql.contains("q134_dsir_select"))
    assert(SparkEntry.oracleSql("q134_dsir_select").contains("read_parquet"))
  }
}
