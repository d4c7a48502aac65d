package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Decontamination, Dedup, DupClusters, Shards, Vocab}
import graft.sources.Tables

/** Round-4 pipeline operators: decontamination, duplicate clustering
  * (connected components), shard packing, OOV scoring. */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  // ---- q39 decontamination ----

  test("decontamination flags a planted 8-gram copy and nothing else") {
    val bench = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // contains bench 8-gram "alpha … theta" (positions 1-8) twice-distinct? once
      (10L, "xx alpha beta gamma delta epsilon zeta eta theta yy"),
      (11L, "totally unrelated words that never overlap with anything here"),
      (12L, "alpha beta gamma delta epsilon zeta eta wrong tail end")) // 7-token overlap only
      .toDF("doc_id", "text")
    val out = Decontamination.contaminationCounts(corpus, bench, n = 8)
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(out === Array((10L, 1L), (11L, 0L), (12L, 0L)))
  }

  test("memorization risk flags only corpus-unique long spans: a " +
    "duplicated document carries zero unique spans, a singleton " +
    "document's spans are all unique") {
    import spark.implicits._
    // docs 1 and 2 are verbatim duplicates (every 8-gram has df=2);
    // doc 3 is a singleton (every 8-gram unique); doc 4 is too short
    // to form any 8-gram
    val txt = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, txt), (2L, txt),
      (3L, "one two three four five six seven eight nine"),
      (4L, "too short for an eight gram"))
      .toDF("doc_id", "text")
    val out = Decontamination.memorizationRisk(docs, n = 8)
      .as[(Long, Long, Long)].collect()
    // 10 tokens -> 3 distinct 8-grams; 9 -> 2; 6 -> 0
    assert(out === Array((1L, 3L, 0L), (2L, 3L, 0L), (3L, 2L, 2L),
      (4L, 0L, 0L)))
  }

  test("diversity sample keeps at most the quota per cluster, picks " +
    "are dense ranks, and repeats are deterministic") {
    val out = graft.operators.Sampling.diversitySample(spark, sf)
    val rows = out.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_._1)
    byCluster.foreach { case (c, rs) =>
      assert(rs.length <= 4, s"cluster $c exceeded the quota")
      assert(rs.map(_._3).sorted.toSeq === (1 to rs.length).toSeq,
        s"cluster $c picks are not a dense 1..n rank")
    }
    rows.foreach { case (_, _, _, sim) =>
      assert(sim >= -1.0001 && sim <= 1.0001, "cent_sim outside [-1,1]")
    }
    val again = graft.operators.Sampling.diversitySample(spark, sf)
      .collect().map(_.toString).toSeq
    assert(again === out.collect().map(_.toString).toSeq)
  }

  test("decontamination counts distinct contaminated grams per doc") {
    val bench = Seq((1L, "a b c d e f g h i j"))
      .toDF("doc_id", "text") // bench grams: a..h, b..i, c..j
    val corpus = Seq((10L, "a b c d e f g h i zz")) // shares a..h and b..i
      .toDF("doc_id", "text")
    val out = Decontamination.contaminationCounts(corpus, bench, n = 8)
      .as[(Long, Long)].collect()
    assert(out === Array((10L, 2L)))
  }

  // ---- q40 connected components ----

  /** Brute-force union-find reference. */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def ccCheck(edges: Seq[(Long, Long)]): Unit = {
    val got = DupClusters.connectedComponents(edges.toDF("u", "v"))
      .as[(Long, Long)].collect().toMap
    assert(got === ufComponents(edges))
  }

  test("connected components: long path collapses to its minimum") {
    // diameter 63 — naive min-propagation would need 63 rounds; star
    // contraction must land well inside the round cap
    ccCheck((0L until 63L).map(i => (i, i + 1)))
  }

  test("connected components: chain of near-dup pairs is ONE cluster") {
    ccCheck(Seq((5L, 9L), (9L, 2L), (17L, 20L))) // {2,5,9} and {17,20}
  }

  test("connected components: random graphs match union-find") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val n = 60
      val edges = (1 to 80).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      ccCheck(edges)
    }
  }

  test("convergence short-circuit: exceptAll runs only in count-equal rounds (once on cliques)") {
    // Pins the `nextCount == prevCount && next.exceptAll(edges).isEmpty`
    // short-circuit (DupClusters.connectedComponents). Contract: the
    // set-difference runs ONLY in rounds whose edge count matched the
    // previous round's. On count-SHRINKING graphs — the near-dup shape,
    // where clusters are dense pair sets that contract — that is exactly
    // the one final convergence round. (A pure chain graph PRESERVES its
    // canonical edge count across rounds, so each of its ~log² rounds
    // pays the exact set-equality test — the documented price of an
    // exact convergence check; this test pins the dense-graph contract
    // a refactor to unconditional evaluation would break.)
    val excepts = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        if (qe.analyzed.collect {
          case e: org.apache.spark.sql.catalyst.plans.logical.Except => e
        }.nonEmpty) excepts.incrementAndGet()
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // two disjoint 8-cliques: 2×28 edges contract to 2×7 star edges in
      // round 1 (counts differ -> no exceptAll), round 2 reproduces the
      // same stars (counts equal -> the ONE exceptAll) and converges
      val edges = (for {
        base <- Seq(0L, 100L)
        i <- 1 to 8; j <- 1 to 8 if i < j
      } yield (base + i, base + j)).toDF("u", "v")
      val cc = DupClusters.connectedComponents(edges)
      // sanity on the result before asserting on the listener
      val out = cc.collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(out.map(_._2).toSet === Set(1L, 101L))
      assert(out.length === 16)
      // drain the async listener bus: poll until the counter is stable
      var last = -1
      var stableSince = System.currentTimeMillis()
      val deadline = System.currentTimeMillis() + 15000
      while (System.currentTimeMillis() < deadline &&
          (last != excepts.get() || System.currentTimeMillis() - stableSince < 1000)) {
        if (last != excepts.get()) { last = excepts.get(); stableSince = System.currentTimeMillis() }
        Thread.sleep(100)
      }
      // the collect() above evaluates the returned frame, whose ROOTS
      // computation also contains an Except — so the in-loop budget is
      // excepts ≤ 2 total: one convergence check + one roots evaluation
      assert(excepts.get() === 2,
        s"Except-bearing actions ran ${excepts.get()} times (expected 2: one " +
          "convergence exceptAll + the returned frame's roots anti-join) — " +
          "the counts-differ short-circuit is broken")
    } finally spark.listenerManager.unregister(listener)
  }

  test("connected components: duplicate/reversed edges and self-pairs are harmless") {
    ccCheck(Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (3L, 4L)).filter(e => e._1 != e._2))
  }

  // ---- q64 substring-level span dedup ----

  test("span dedup finds exact boundaries of a planted cross-doc duplicate run") {
    val shared = (1 to 20).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 a3 a4 $shared a5 a6"), // shared occupies tokens 5..24
      (2L, s"b1 $shared b2 b3 b4 b5"),    // shared occupies tokens 2..21
      (3L, (1 to 30).map(i => s"solo$i").mkString(" "))) // no cross-doc dup
      .toDF("doc_id", "text")
    val got = Dedup.spanDedup(docs, n = 20)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 5L, 24L, 1L), (2L, 2L, 21L, 1L)))
  }

  test("span dedup merges overlapping duplicated windows into one maximal span") {
    val shared = (1 to 21).map(i => s"dup$i").mkString(" ") // 21 tokens: 2 windows
    val docs = Seq((1L, shared), (2L, s"x $shared"))
      .toDF("doc_id", "text")
    val got = Dedup.spanDedup(docs, n = 20)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // both windows of each doc are duplicated and overlap -> ONE span each
    assert(got === Seq((1L, 1L, 21L, 2L), (2L, 2L, 22L, 2L)))
  }

  test("span dedup matches a brute-force reference on random corpora") {
    // brute force: hash every n-gram STRING, mark cross-doc duplicated
    // window positions, merge overlapping [p, p+n-1] intervals
    def brute(docs: Seq[(Long, String)], n: Int): Seq[(Long, Long, Long, Long)] = {
      val grams = docs.flatMap { case (id, text) =>
        val ws = text.trim.toLowerCase.split("\\s+").toSeq
        (0 to ws.length - n).map(i => (id, i + 1, ws.slice(i, i + n).mkString(" ")))
      }
      val dup = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size > 1).keySet
      docs.flatMap { case (id, _) =>
        val ps = grams.filter(g => g._1 == id && dup(g._3)).map(_._2).sorted
        val spans = ps.foldLeft(List.empty[(Int, Int, Int)]) {
          case ((s, e, c) :: rest, p) if p <= e => (s, p + n - 1, c + 1) :: rest
          case (acc, p) => (p, p + n - 1, 1) :: acc
        }.reverse
        spans.map { case (s, e, c) => (id, s.toLong, e.toLong, c.toLong) }
      }.sortBy(t => (t._1, t._2))
    }
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val n = 4
      // small vocab forces plenty of genuine cross-doc n-gram repeats,
      // including touching-but-not-overlapping windows
      val docs = (1L to 12L).map(id =>
        id -> (1 to 10 + rnd.nextInt(20)).map(_ => s"w${rnd.nextInt(6)}").mkString(" "))
      val got = Dedup.spanDedup(docs.toDF("doc_id", "text"), n)
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(got === brute(docs, n))
    }
  }

  // ---- q34 curation working set ----

  test("curation's shared corpus pass computes exactly once (persist holds)") {
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    // instrument the input with a row-counting nondeterministic filter:
    // nondeterminism pins it in place (no pushdown/duplication), so the
    // accumulator counts how many times the corpus physically streamed
    // through the curation pipeline's shared normalize/tokenize pass
    val acc = spark.sparkContext.longAccumulator("curation-docs-read")
    val tick = udf { (_: Long) => { acc.add(1L); true } }.asNondeterministic()
    val out = Curation.curated(docs.filter(tick(col("doc_id")))).collect()
    assert(out.length === 1)
    assert(acc.value === n,
      s"corpus streamed ${acc.value} rows for $n docs — the persisted working " +
        "set was recomputed instead of served from cache")
  }

  // ---- q41 shard packing ----

  test("shard packing matches the single-window brute force and is partition-count-stable") {
    val docs = Tables.documents(spark, sf)
    val got = Shards.packShards(docs, budget = 1024L)
    // brute force: one global (single-task) window — test-only reference
    val brute = docs
      .select(col("doc_id"),
        size(graft.operators.TextAnalysis.tokensFast(col("text"))).cast("long").as("n_tokens"))
      .withColumn("start_off",
        coalesce(sum("n_tokens").over(
          Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("shard_id", floor(col("start_off") / 1024.0).cast("long"))
      .select("doc_id", "n_tokens", "shard_id")
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty)
    // same assignment when the source arrives pre-shuffled differently
    val got2 = Shards.packShards(docs.repartition(7, col("doc_id")), budget = 1024L)
    assert(got2.exceptAll(brute).isEmpty)
  }

  test("shards are contiguous and within one document of the budget") {
    val m = Shards.shardManifest(Tables.documents(spark, sf), budget = 2048L)
      .orderBy("shard_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    // ids contiguous from 0
    assert(m.map(_._1).toSeq === m.indices.map(_.toLong))
    // doc spans partition the id range in order
    m.sliding(2).foreach { case Array(a, b) => assert(b._4 === a._5 + 1); case _ => }
    // every shard except the last spans its full budget: the NEXT doc
    // would start past the boundary (tokens per shard >= budget - last
    // doc overhang; equivalently n_tokens + shard start >= budget)
    val withStart = m.scanLeft(0L)((acc, s) => acc + s._3).zip(m)
    withStart.dropRight(1).foreach { case (start, s) =>
      assert(start + s._3 >= (s._1 + 1) * 2048L)
      assert(start < (s._1 + 1) * 2048L)
    }
  }

  test("shard spans break documents so every non-last shard holds exactly the budget") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val budget = 512L
    val spans = Shards.packSpans(docs, budget)
      .as[(Long, Long, Long, Long)].collect()
    // spans reassemble each doc exactly: per-doc span lengths sum to its
    // token count and tile [0, n_tokens) without gaps or overlaps
    val toks = docs.select(col("doc_id"),
        size(graft.operators.TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    spans.groupBy(_._2).foreach { case (doc, ss) =>
      val sorted = ss.sortBy(_._3)
      assert(sorted.head._3 === 0L, s"doc $doc first span")
      assert(sorted.last._4 === toks(doc), s"doc $doc last span")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 === a._4, s"doc $doc contiguous")
        case _ =>
      }
    }
    // every shard except the last holds exactly `budget` tokens
    val perShard = spans.groupBy(_._1).view
      .mapValues(_.map(s => s._4 - s._3).sum).toMap
    val last = perShard.keys.max
    perShard.foreach { case (sid, tot) =>
      if (sid != last) assert(tot === budget, s"shard $sid")
      else assert(tot > 0 && tot <= budget, s"last shard $sid")
    }
  }

  test("shard writer lays out one file per shard and round-trips exactly") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val out = "target/test_shards"
    Shards.writeShards(docs, budget = 2048L, out)
    val dirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("shard_id="))
    val manifest = Shards.shardManifest(docs, budget = 2048L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(dirs.length === manifest.length)
    // exactly one data file per shard directory
    dirs.foreach { d =>
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) === 1, d.getName)
    }
    // read-back equals the source, and shard membership matches the manifest spans
    val back = spark.read.parquet(out)
    assert(back.count() === docs.count())
    assert(back.select("doc_id", "text").exceptAll(docs).isEmpty)
    val spans = back.groupBy("shard_id")
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi"), count(lit(1)).as("n"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(spans.map(s => (s._1, s._4, s._2, s._3)).toSeq ===
      manifest.map(m => (m._1, m._2, m._4, m._5)).toSeq)
  }

  // ---- q43 group quota ----

  test("salted group quota equals the naive single-window top-N, skewed groups included") {
    val rnd = new scala.util.Random(7)
    // one giant group (id 0: 5000 rows) + many small ones — the shape
    // that kills a bare partitionBy(group) window
    val rows = (0 until 5000).map(i => (0L, rnd.nextLong())) ++
      (1 to 40).flatMap(g => (0 until rnd.nextInt(20) + 1).map(_ => (g.toLong, rnd.nextLong())))
    val df = rows.toDF("grp", "key").distinct()
    val got = graft.operators.Skew.groupQuota(df, col("grp"),
        Seq(col("key"), col("grp")), n = 3, nSalts = 8)
      .select("grp", "key", "rk")
    val naive = df.withColumn("rk",
        row_number().over(Window.partitionBy("grp").orderBy(col("key").asc, col("grp").asc)))
      .filter(col("rk") <= 3)
      .select("grp", "key", "rk")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
    // quota actually binds: the giant group emits exactly n rows
    assert(got.filter(col("grp") === 0L).count() === 3)
  }

  // ---- q42 vocab / OOV ----

  test("top-k vocabulary is deterministic under df ties and OOV counts occurrences") {
    val ref = Seq((1L, "b a c a"), (2L, "a b d")).toDF("doc_id", "text")
    // df: a=2, b=2, c=1, d=1 — k=3 keeps a, b (df desc) then c (token asc tie)
    val vocab = Vocab.topVocab(ref, 3).as[(String, Long)].collect()
    assert(vocab === Array(("a", 2L), ("b", 2L), ("c", 1L)))
    val corpus = Seq((10L, "a b c d d x")).toDF("doc_id", "text")
    val out = Vocab.oovCounts(corpus, Vocab.topVocab(ref, 3))
      .as[(Long, Long, Long)].collect()
    assert(out === Array((10L, 6L, 3L))) // d, d, x are OOV occurrences
  }

  // ---- q65 overlapping chunking ----

  test("unigramNll matches a plain-Scala Laplace-smoothed model; OOV scores strictly worse") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat"),
      (3L, "zx qq zx"), // held-out: all tokens OOV vs the model below
      (6L, "the cat sat")) // held-out: all in-model
      .toDF("doc_id", "text")
    val ref = docs.filter(col("doc_id") % 3 =!= 0)
    val held = docs.filter(col("doc_id") % 3 === 0)
    val alpha = 0.5
    val got = Vocab.unigramNll(held, Vocab.unigramModel(ref), alpha)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // plain-Scala reference model from the same slices
    val tok = (s: String) => s.toLowerCase.trim.replaceAll("\\s+", " ").split(" ").toSeq
    val counts = Seq("the cat sat on the mat", "the dog sat").flatMap(tok)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = counts.values.sum.toDouble
    val v = counts.size.toDouble
    def nll(text: String): (Double, Long) = {
      val ts = tok(text)
      val scores = ts.map(t =>
        -math.log((counts.getOrElse(t, 0L) + alpha) / (n + alpha * (v + 1))))
      (scores.sum / scores.size, ts.size.toLong)
    }
    Seq(3L -> "zx qq zx", 6L -> "the cat sat").foreach { case (id, text) =>
      val (expNll, expN) = nll(text)
      assert(got(id)._2 === expN)
      assert(math.abs(got(id)._1 - expNll) < 1e-12,
        s"doc $id: ${got(id)._1} vs $expNll")
    }
    // the all-OOV document must score strictly worse than the fluent one
    assert(got(3L)._1 > got(6L)._1)
  }

  test("lmFrequencyScore: OOV/min/sum bookkeeping on crafted edge docs") {
    val docs = Seq(
      (1L, "a a b"), (2L, "a c"),       // model slice: a->3, b->1, c->1
      (3L, "a b zz"),                   // held out: 2 in-model, 1 OOV
      (6L, "zz qq"))                    // held out: all OOV
      .toDF("doc_id", "text")
    val got = Vocab.lmFrequencyScore(
      docs.filter(col("doc_id") % 3 === 0),
      Vocab.unigramModel(docs.filter(col("doc_id") % 3 =!= 0)))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(got(3L) === ((3L, 1L, 4L, Some(1L)))) // a(3) + b(1); min=b(1)
    assert(got(6L) === ((2L, 2L, 0L, None)))     // all OOV: sum 0, min NULL
  }

  // ---- q106 bigram LM / Stupid Backoff ----

  test("bigramBackoffScore: floor, backoff and OOV2 bookkeeping on crafted docs") {
    val docs = Seq(
      (1L, "the cat sat on the mat the cat sat"),
      (2L, "the cat ran"),
      // model: bigrams >=2 -> {the cat: 3, cat sat: 2};
      // unigrams -> the:4 cat:3 sat:2 on:1 mat:1 ran:1
      (3L, "the cat sat zz qq"), // 2 hits (3+2), 2 misses w2-OOV
      (6L, "ran the"),           // 1 miss backing off to c(the)=4
      (9L, "solo"),              // no bigrams: all zeros via outer join
      (12L, "cat sat on"))       // "sat on" seen ONCE in ref: floored out
      .toDF("doc_id", "text")
    val ref = docs.filter(col("doc_id") % 3 =!= 0)
    val got = Vocab.bigramBackoffScore(
      docs.filter(col("doc_id") % 3 === 0),
      Vocab.bigramModel(ref, floor = 2L), Vocab.unigramModel(ref))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got(3L) === ((4L, 2L, 5L, 0L, 0L, 2L)))
    assert(got(6L) === ((1L, 0L, 0L, 1L, 4L, 0L)))
    assert(got(9L) === ((0L, 0L, 0L, 0L, 0L, 0L)))
    assert(got(12L) === ((2L, 1L, 2L, 1L, 1L, 0L)))
  }

  test("bigramBackoffNll matches a plain-Scala Stupid-Backoff model; garble scores worse") {
    val docs = Seq(
      (1L, "the cat sat on the mat the cat sat"),
      (2L, "the cat ran"),
      (3L, "the cat sat zz qq"),
      (6L, "ran the"),
      (12L, "cat sat on"))
      .toDF("doc_id", "text")
    val ref = docs.filter(col("doc_id") % 3 =!= 0)
    val (lambda, alpha) = (0.4, 0.5)
    val got = Vocab.bigramBackoffNll(
      docs.filter(col("doc_id") % 3 === 0),
      Vocab.bigramModel(ref, floor = 2L), Vocab.unigramModel(ref),
      lambda, alpha)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // plain-Scala reference from the same slices
    val tok = (s: String) => s.toLowerCase.trim.replaceAll("\\s+", " ").split(" ").toSeq
    val refToks = Seq("the cat sat on the mat the cat sat", "the cat ran").map(tok)
    val uni = refToks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val big = refToks.flatMap(ts => ts.zip(ts.tail).map { case (a, b) => s"$a $b" })
      .groupBy(identity).view.mapValues(_.size.toLong).filter(_._2 >= 2L).toMap
    val n = uni.values.sum.toDouble
    val v = uni.size.toDouble
    def nll(text: String): (Double, Long) = {
      val ts = tok(text)
      val scores = ts.zip(ts.tail).map { case (a, b) =>
        big.get(s"$a $b") match {
          case Some(cab) => -math.log(cab.toDouble / uni(a).toDouble)
          case None => -math.log(lambda * (uni.getOrElse(b, 0L) + alpha) /
            (n + alpha * (v + 1)))
        }
      }
      (scores.sum / scores.size, scores.size.toLong)
    }
    Seq(3L -> "the cat sat zz qq", 6L -> "ran the", 12L -> "cat sat on")
      .foreach { case (id, text) =>
        val (expNll, expN) = nll(text)
        assert(got(id)._2 === expN)
        assert(math.abs(got(id)._1 - expNll) < 1e-12,
          s"doc $id: ${got(id)._1} vs $expNll")
      }
    // the hit-heavy document must score better than the w2-OOV one
    assert(got(12L)._1 < got(3L)._1)
  }

  // ---- q115 Naive Bayes classifier ----

  test("nbEvidence counts multiplicity-weighted hits and unseen tokens exactly") {
    val train = Seq(
      ("good", "the cat sat the cat"),   // good: the=2 cat=2 sat=1
      ("bad", "zz zz cat"))              // bad: zz=2 cat=1
      .toDF("lang", "text").withColumnRenamed("lang", "label")
      .withColumn("doc_id", lit(0L))
    val model = Vocab.nbModel(train, "label")
    val held = Seq((1L, "the cat zz unknown")).toDF("doc_id", "text")
    val got = Vocab.nbEvidence(held, model)
      .collect().map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // good: the(2)+cat(2)+zz(miss)+unknown(miss) = hits 4, unseen 2
    assert(got("good") === ((4L, 4L, 2L)))
    // bad: the(miss)+cat(1)+zz(2)+unknown(miss) = hits 3, unseen 2
    assert(got("bad") === ((4L, 3L, 2L)))
  }

  test("nbPosterior matches plain-Scala NB at 1e-12; separable corpus classifies perfectly") {
    // planted separable classes: disjoint vocabularies per class
    val vocabByClass = Map(
      "alpha" -> Seq("ape", "axe", "ant", "arc"),
      "beta"  -> Seq("bat", "bow", "bee", "bug"),
      "gamma" -> Seq("gnu", "gum", "gas", "gel"))
    val rnd = new scala.util.Random(42)
    def doc(cls: String, n: Int): String =
      Seq.fill(n)(vocabByClass(cls)(rnd.nextInt(4))).mkString(" ")
    val trainRows = (for {
      (cls, i) <- vocabByClass.keys.toSeq.sorted.zipWithIndex
      j <- 0 until (3 + i) // unequal priors on purpose
    } yield (cls, doc(cls, 8))).zipWithIndex
      .map { case ((c, t), id) => (id.toLong, c, t) }
    val train = trainRows.toDF("doc_id", "label", "text")
    val heldRows = vocabByClass.keys.toSeq.sorted.zipWithIndex
      .flatMap { case (c, i) => Seq((100L + i, c, doc(c, 6))) }
    val held = heldRows.toDF("doc_id", "truth", "text")
    val model = Vocab.nbModel(train, "label")
    val priors = Vocab.nbPriors(train, "label")
    val post = Vocab.nbPosterior(held.select(col("doc_id"), col("text")),
      model, priors).collect()
    // plain-Scala reference with the same formula
    val tok = (s: String) => s.toLowerCase.trim.replaceAll("\\s+", " ").split(" ").toSeq
    val cwt = trainRows.flatMap { case (_, c, t) => tok(t).map(c -> _) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ct = cwt.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val vv = cwt.keys.map(_._2).toSet.size.toDouble
    val ndc = trainRows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nd = trainRows.size.toDouble
    def refScore(text: String, cls: String): Double =
      math.log(ndc(cls) / nd) + tok(text).map(t =>
        math.log((cwt.getOrElse((cls, t), 0L) + 1.0) / (ct(cls) + vv))).sum
    post.foreach { r =>
      val (id, cls, score) = (r.getLong(0), r.getString(1), r.getDouble(2))
      val text = heldRows.find(_._1 == id).get._3
      assert(math.abs(score - refScore(text, cls)) < 1e-12,
        s"doc $id class $cls: $score vs ${refScore(text, cls)}")
    }
    // separable vocabularies => the argmax recovers every true class
    val pred = post.filter(_.getBoolean(3))
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    heldRows.foreach { case (id, truth, _) => assert(pred(id) === truth) }
    // exactly one prediction per document
    assert(post.count(_.getBoolean(3)) === heldRows.size)
  }

  test("containmentJoin finds a planted quote asymmetrically (inner->outer only)") {
    val quote = (1 to 12).map(i => s"q$i").mkString(" ")
    val filler = (1 to 60).map(i => s"f$i").mkString(" ")
    val docs = Seq(
      (1L, quote),                   // the short doc IS the quote
      (2L, s"$filler $quote"),       // long doc containing the quote verbatim
      (3L, (1 to 20).map(i => s"z$i").mkString(" "))) // unrelated
      .toDF("doc_id", "text")
    val got = Dedup.containmentJoin(docs, n = 3, tau = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // doc 1's grams all appear in doc 2 => containment(1->2) = 1.0;
    // the reverse direction is far below tau; nothing else pairs
    assert(got.map(t => (t._1, t._2)).toSeq === Seq((1L, 2L)))
    assert(got.head._3 === 1.0)
  }

  test("containmentJoin prefix filter is lossless vs the brute-force scan on real data") {
    val docs = Tables.documents(spark, sf)
    val got = Dedup.containmentJoin(docs, n = 3, tau = 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // brute force over the same hashed gram sets (no prefix filter)
    val base = docs
      .filter(size(graft.operators.TextAnalysis.tokensFast(col("text"))) >= 3)
      .select(col("doc_id"), array_sort(array_distinct(
        graft.operators.TextAnalysis.shingleHashArray(
          graft.operators.TextAnalysis.tokensFast(col("text")), 3))).as("hs"))
    val a = base.select(col("doc_id").as("ia"), col("hs").as("sa"))
    val b = base.select(col("doc_id").as("ib"), col("hs").as("sb"))
    val brute = a.join(b, col("ia") =!= col("ib"))
      .select(col("ia"), col("ib"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(col("sa")).cast("double")).as("c"))
      .filter(col("c") >= 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got === brute)
    assert(brute.nonEmpty) // sf0.001 plants exact twins: containment 1.0 both ways
  }

  test("segmentDedup keeps first occurrences only and reassembles in order") {
    // 10-token segments built from single-letter tokens; A/B/C/D are
    // distinct 10-token runs
    def run(c: Char) = Seq.fill(10)(c.toString).mkString(" ")
    val (a, b, cc, d) = (run('a'), run('b'), run('c'), run('d'))
    val docs = Seq(
      (1L, s"$a $b"),      // first owner of A and B
      (2L, s"$b $cc"),     // B dropped (first seen doc 1 pos 1), C kept
      (3L, s"$a $b"),      // identical to doc 1: keeps nothing
      (4L, s"$d $d")       // within-doc repeat: first D kept only
    ).toDF("doc_id", "text")
    val got = Dedup.segmentDedup(docs, w = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(1L) === ((2L, 2L, s"$a $b")))
    assert(got(2L) === ((2L, 1L, cc)))
    assert(got(3L) === ((2L, 0L, "")))
    assert(got(4L) === ((2L, 1L, d)))
  }

  test("segmentDedup: short tails segment correctly and survive independently") {
    def run(c: Char, n: Int) = Seq.fill(n)(c.toString).mkString(" ")
    val docs = Seq(
      (1L, run('a', 10) + " " + run('x', 3)), // 13 tokens: full A + 3-token tail
      (2L, run('x', 3))                       // 3-token doc: same TEXT as doc 1's tail
    ).toDF("doc_id", "text")
    val got = Dedup.segmentDedup(docs, w = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // doc 1: two segments (10 + 3-token tail); doc 2's single segment
    // equals doc 1's tail string, so it is a duplicate and drops
    assert(got(1L) === ((2L, 2L, run('a', 10) + " " + run('x', 3))))
    assert(got(2L) === ((1L, 0L, "")))
  }

  test("leakage-safe split: no near-dup pair straddles splits; the doc-keyed split does") {
    import graft.operators.Sampling
    // ids 1 and 3 are chosen because md5("1") buckets to train and
    // md5("3") to test under the 80/10/10 thresholds — so the naive
    // doc_id-keyed split provably separates the identical twins below
    val twin = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, twin), (3L, twin),
      (7L, "completely different words nothing shared here at all today ok"))
      .toDF("doc_id", "text")
    val pairs = Dedup.jaccardJoin(docs, n = 3, tau = 0.7)
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
    assert(pairs.count() === 1) // the twins pair up, the third doc doesn't
    val safe = Sampling.leakageSafeSplit(docs, DupClusters.connectedComponents(pairs), 0.8, 0.1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // both twins share cluster 1 and therefore ONE split
    assert(safe(1L)._1 === 1L && safe(3L)._1 === 1L)
    assert(safe(1L)._2 === safe(3L)._2)
    // the unclustered doc keys on itself
    assert(safe(7L)._1 === 7L)
    // negative control: the naive per-doc split separates the twins
    val naive = docs.select(col("doc_id"),
        Sampling.splitColumn(col("doc_id"), 0.8, 0.1).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(naive(1L) !== naive(3L),
      "fixture drift: ids 1/3 no longer split apart under the doc-keyed hash")
  }

  test("leakage-safe split property on real data: every q28 pair lands in one split") {
    import graft.operators.Sampling
    val docs = Tables.documents(spark, sf)
    val pairs = Dedup.jaccardJoin(docs, n = 3, tau = 0.7)
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
    val split = Sampling.leakageSafeSplit(docs, DupClusters.connectedComponents(pairs), 0.8, 0.1)
    val straddling = pairs
      .join(split.select(col("doc_id").as("u"), col("split").as("sa")), Seq("u"))
      .join(split.select(col("doc_id").as("v"), col("split").as("sb")), Seq("v"))
      .filter(col("sa") =!= col("sb"))
      .count()
    assert(straddling === 0L)
  }

  test("clean-manifest composition is consistent with its stage operators") {
    import graft.operators.Sampling
    val docs = Tables.documents(spark, sf)
    val manifest = SparkEntry.queries("q100_clean_manifest")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // totals across splits must equal the stage operators' own totals
    val nDocs = docs.count()
    assert(manifest.values.map(_._1).sum === nDocs)
    val keptTotal = Dedup.segmentDedup(docs, w = 10)
      .agg(sum("n_kept")).head().getLong(0)
    assert(manifest.values.map(_._2).sum === keptTotal)
    // surviving tokens are bounded by surviving segments x width, and
    // every kept segment holds at least one token
    manifest.values.foreach { case (_, segs, toks) =>
      assert(toks <= segs * 10 && toks >= segs)
    }
    // split keys come from the leakage-safe assignment: spot-check that
    // the manifest's split universe matches the assignment's
    val pairs = Dedup.jaccardJoin(docs, n = 3, tau = 0.7)
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
    val splits = Sampling.leakageSafeSplit(docs, DupClusters.connectedComponents(pairs), 0.8, 0.1)
      .select("split").distinct().collect().map(_.getString(0)).toSet
    assert(manifest.keySet === splits)
  }

  test("encodeTokenIds assigns deterministic ids, zeroes OOV, and preserves order") {
    import graft.operators.Vocab
    // df: b in 3 docs, a in 2, c in 1 -> ids b=1, a=2 (tie-break by df
    // then token), c OOV under k=2
    val docs = Seq(
      (1L, "a b b"),
      (2L, "b a"),
      (3L, "b c")).toDF("doc_id", "text")
    val vocab = Vocab.topVocab(docs, k = 2)
    val got = Vocab.encodeTokenIds(docs, vocab)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(1L) === ((3L, 0L, "2 1 1")))
    assert(got(2L) === ((2L, 0L, "1 2")))
    assert(got(3L) === ((2L, 1L, "1 0")))
    // round-trip: decoding in-vocab ids recovers the original tokens
    val idToTok = Vocab.vocabIds(vocab).collect()
      .map(r => r.getInt(1) -> r.getString(0)).toMap
    val decoded = got(1L)._3.split(" ").map(_.toInt).map(idToTok).mkString(" ")
    assert(decoded === "a b b")
  }

  test("chunking matches the per-doc brute force window-for-window") {
    val (w, s) = (64, 48)
    val got = Shards.chunkOverlap(Tables.documents(spark, sf), w, s)
      .select("doc_id", "chunk_idx", "n_tokens", "chunk")
      .as[(Long, Int, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect()
    assert(docs.nonEmpty)
    docs.foreach { case (id, text) =>
      val toks = text.trim.toLowerCase.replaceAll("\\s+", " ").split(" ", -1)
      val expect = (0 until (1 + (toks.length - 1) / s)).map { i =>
        val win = toks.slice(i * s, math.min(i * s + w, toks.length))
        (id, i, win.length, win.mkString(" "))
      }
      assert(got(id).toSeq === expect, s"doc $id")
    }
  }

  test("chunking: a doc shorter than one window emits exactly itself") {
    val df = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val out = Shards.chunkOverlap(df, window = 64, stride = 48)
      .as[(Long, Int, Int, String)].collect()
    assert(out === Array((1L, 0, 3, "alpha beta gamma")))
  }

  test("chunking strides reconstruct the document with no token lost") {
    // concatenating each chunk's first `stride` tokens (all of the last
    // chunk) must reproduce the normalized document exactly
    val (w, s) = (8, 5)
    val df = Seq((7L, (1 to 23).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = Shards.chunkOverlap(df, w, s)
      .orderBy("chunk_idx").select("chunk").as[String].collect()
    val rebuilt = chunks.init.map(_.split(" ", -1).take(s).mkString(" ")) :+
      chunks.last
    assert(rebuilt.mkString(" ") === (1 to 23).map(i => s"t$i").mkString(" "))
  }

  // ---- q68 CDC latest-per-key ----

  test("CDC latest-per-key matches the collected brute force") {
    val got = graft.operators.SnapshotDiff.latestByKey(
        Tables.events(spark, sf), key = Seq("user_id"), ts = "ts",
        tiebreak = "event_id", payload = Seq("event_type", "value"))
      .select("user_id", "last_ts", "last_event_id", "last_event_type",
        "last_value", "n_versions")
      .as[(Long, Long, Long, String, Double, Long)].collect().sortBy(_._1)
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type", "value")
      .as[(Long, Long, Long, String, Double)].collect()
    val expect = ev.groupBy(_._1).toArray.sortBy(_._1).map { case (u, rows) =>
      val (_, ts, id, tpe, v) = rows.maxBy(r => (r._2, r._3))
      (u, ts, id, tpe, v, rows.length.toLong)
    }
    assert(got === expect)
    assert(got.map(_._6).sum === ev.length.toLong) // every version accounted
  }

  test("CDC latest-per-key tiebreak makes equal timestamps deterministic") {
    val df = Seq(
      (1L, 100L, 10L, "a", 1.0), (1L, 100L, 11L, "b", 2.0),
      (2L, 50L, 5L, "c", 3.0), (2L, 40L, 99L, "d", 4.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = graft.operators.SnapshotDiff.latestByKey(df,
        Seq("user_id"), "ts", "event_id", Seq("event_type", "value"))
      .orderBy("user_id")
      .select("user_id", "last_event_id", "last_event_type", "n_versions")
      .as[(Long, Long, String, Long)].collect()
    // user 1: equal ts -> higher event_id wins; user 2: higher ts wins
    // even against a higher event_id
    assert(out === Array((1L, 11L, "b", 2L), (2L, 5L, "c", 2L)))
  }

  // ---- q70 cross-corpus dedup ----

  test("cross dedup equals the within-union jaccard join restricted to cross pairs") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val got = Dedup.crossJaccardMatches(corpus, batch, n = 3, tau = 0.7)
      .as[(Long, Long, Double)].collect()
      .map { case (c, b, j) => (math.min(c, b), math.max(c, b), j) }.toSet
    val all = Dedup.jaccardJoin(docs, n = 3, tau = 0.7)
      .as[(Long, Long, Double)].collect()
    val expect = all.filter { case (a, b, _) =>
      (a % 3 == 0) != (b % 3 == 0) // exactly one side is a batch doc
    }.map { case (a, b, j) => (math.min(a, b), math.max(a, b), j) }.toSet
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("cross dedup keeps overlapping doc-id spaces apart") {
    // same doc_id on both sides must still pair corpus-vs-batch by CONTENT
    val corpus = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val batch = Seq((1L, "a b c d e f g h"), (2L, "x y z w v u t s"))
      .toDF("doc_id", "text")
    val out = Dedup.crossJaccardMatches(corpus, batch, n = 3, tau = 0.7)
      .as[(Long, Long, Double)].collect()
    assert(out === Array((1L, 1L, 1.0)))
  }

  // ---- q72 survivor election ----

  test("keep list elects the longest doc per cluster, ties to smallest id") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    // cluster 1: doc 2 longest; cluster 10: tie on score -> doc 10 wins
    val stats = Seq((1L, 5L), (2L, 9L), (3L, 9L), (10L, 4L), (11L, 4L))
      .toDF("doc_id", "score")
    val out = DupClusters.keepList(clusters, stats)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(out === Array(
      (1L, 1L, 2L, false), (2L, 1L, 2L, true), (3L, 1L, 2L, false),
      (10L, 10L, 10L, true), (11L, 10L, 10L, false)))
  }

  test("keep list marks exactly one survivor per cluster on real clusters") {
    val docs = Tables.documents(spark, sf)
    val pairs = Dedup.jaccardJoin(docs, n = 3, tau = 0.7)
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
    val out = DupClusters.keepList(
        DupClusters.connectedComponents(pairs),
        docs.select(col("doc_id"), col("n_chars").as("score")))
      .as[(Long, Long, Long, Boolean)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._2).foreach { case (cid, rows) =>
      assert(rows.count(_._4) === 1, s"cluster $cid")
      val canon = rows.head._3
      assert(rows.forall(_._3 == canon))
      assert(rows.exists(_._1 == canon)) // canonical is a member
    }
  }

  // ---- q73 quantile gate ----

  test("quantile gate matches the brute-force per-group threshold filter") {
    val base = Tables.documents(spark, sf)
      .select(col("lang"), col("doc_id"), col("n_chars").cast("double").as("x"))
    val got = graft.operators.Curation.quantileFilter(base, "lang", p = 0.25)
      .select("doc_id").as[Long].collect().sorted
    val rows = Tables.documents(spark, sf)
      .select("doc_id", "lang", "n_chars").as[(Long, String, Long)].collect()
    def thr(xs: Array[Double]): Double = {
      val s = xs.sorted
      val pos = 0.25 * (s.length - 1).toDouble
      val f = pos - math.floor(pos)
      s(math.floor(pos).toInt) * (1.0 - f) + s(math.ceil(pos).toInt) * f
    }
    val ts = rows.groupBy(_._2).view.mapValues(rs => thr(rs.map(_._3.toDouble))).toMap
    val expect = rows.filter { case (_, l, n) => n.toDouble >= ts(l) }
      .map(_._1).sorted
    assert(got === expect)
    assert(got.length < rows.length && got.nonEmpty) // the gate binds
  }

  // ---- q71 PMI bigrams ----

  test("PMI bigram ratios match the collected brute force") {
    val got = Vocab.pmiBigrams(Tables.documents(spark, sf), minCount = 2L, k = 50)
      .as[(String, Long, Double)].collect()
    val toks = Tables.documents(spark, sf).select("text").as[String].collect()
      .map(_.trim.toLowerCase.replaceAll("\\s+", " ").split(" ", -1))
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nUni = uni.values.sum
    val bigs = toks.filter(_.length >= 2)
      .flatMap(ws => ws.init.zip(ws.tail).map { case (a, b) => s"$a $b" })
    val nBg = bigs.length.toLong
    val expect = bigs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      .filter(_._2 >= 2L)
      .map { case (bg, cab) =>
        val Array(a, b) = bg.split(" ")
        val ratio = (cab.toDouble / nBg.toDouble) /
          ((uni(a).toDouble / nUni.toDouble) * (uni(b).toDouble / nUni.toDouble))
        (bg, cab, ratio)
      }.toSeq.sortBy { case (bg, _, r) => (-r, bg) }.take(50)
    assert(got.toSeq === expect)
    assert(got.length === 50)
  }

  // ---- q69 robust outliers ----

  test("median/MAD outlier counts match the collected brute force bit-for-bit") {
    val got = graft.operators.Profiling.robustOutliers(
        Tables.events(spark, sf)
          .select(col("event_type"), col("value").cast("double").as("x")),
        "event_type", k = 3.0)
      .select("event_type", "med", "mad", "n_outliers", "n")
      .as[(String, Double, Double, Long, Long)].collect().sortBy(_._1)
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), col("value").cast("double"))
      .as[(String, Double)].collect()
    // the exactPercentiles interpolation: lo*(1-f) + hi*f at pos p*(n-1)
    def median(xs: Array[Double]): Double = {
      val s = xs.sorted
      val pos = 0.5 * (s.length - 1).toDouble
      val f = pos - math.floor(pos)
      s(math.floor(pos).toInt) * (1.0 - f) + s(math.ceil(pos).toInt) * f
    }
    val expect = rows.groupBy(_._1).toArray.sortBy(_._1).map { case (g, rs) =>
      val xs = rs.map(_._2)
      val med = median(xs)
      val mad = median(xs.map(x => math.abs(x - med)))
      (g, med, mad, xs.count(x => math.abs(x - med) > 3.0 * mad).toLong,
        xs.length.toLong)
    }
    assert(got === expect)
    assert(got.exists(_._4 > 0)) // the threshold actually fires somewhere
  }

  test("robust outliers: a planted extreme value is flagged, the bulk is not") {
    val df = ((1 to 99).map(i => ("g", (i % 10).toDouble)) :+ ("g", 1e9))
      .toDF("grp", "x")
    val out = graft.operators.Profiling.robustOutliers(df, "grp", k = 3.0)
      .select("n_outliers", "n").as[(Long, Long)].head()
    assert(out === ((1L, 100L)))
  }
}
