package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Intervals, Profiling, ReferenceHypercube, Sampling, TextAnalysis, Vocab}

/** Property-based tests (SURVEY.md §5.4): engine invariants over random
  * generated datasets. ScalaCheck generators drive the data; the sweep
  * is a fixed deterministic seed list (the scalatest-plus bridge isn't
  * in the offline dependency cache, so sampling is explicit). */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
  private def bounded(seed: Long, lo: Int, hi: Int): Int =
    lo + Math.floorMod(mix(seed), (hi - lo + 1).toLong).toInt

  private val genDims: Gen[(Int, Int, Int)] = for {
    nClients <- Gen.choose(3, 30)
    nContracts <- Gen.choose(3, 60)
    nInvoices <- Gen.choose(10, 400)
  } yield (nClients, nContracts, nInvoices)

  test("hypercube invariants hold for random datasets") {
    import spark.implicits._
    (1L to 8L).foreach { run =>
      val (nc, nk, ni) = sample(genDims, run)
      val seed = mix(run)
      val clients = (1 to nc).map(i =>
        (i, bounded(seed + i, 1, 5), bounded(seed + i + 7, 1, 578), bounded(seed + i + 13, 1, 6)))
        .toDF("id", "type", "geo", "misc")
      val contracts = (1 to nk).map(i =>
        (i, bounded(seed * 3 + i, 1, nc), bounded(seed * 3 + i + 7, 1, 5)))
        .toDF("id", "client", "nature")
      val invoices = (1 to ni).map(i =>
        (bounded(seed * 5 + i, 1, nk), bounded(seed * 5 + i + 7, 1, 36),
          bounded(seed * 5 + i + 13, 0, 9999) / 100.0f, bounded(seed * 5 + i + 17, 0, 500)))
        .toDF("contract", "time", "amount", "consumption")

      val cube = ReferenceHypercube.hypercube(clients, contracts, invoices).collect()

      // per-group: 1 <= nclients <= ncontrats <= ninvoices
      cube.foreach { r =>
        val (ncli, ncon, ninv) =
          (r.getAs[Long]("nclients"), r.getAs[Long]("ncontrats"), r.getAs[Long]("ninvoices"))
        assert(1L <= ncli && ncli <= ncon && ncon <= ninv)
      }
      // global: sum(ninvoices) == fact row count (every generated FK is valid)
      assert(cube.map(_.getAs[Long]("ninvoices")).sum === ni.toLong)
      // output totally ordered by the 5 dims
      val keys = cube.map(r => (r.getAs[Int]("geo"), r.getAs[Int]("type"),
        r.getAs[Int]("misc"), r.getAs[Int]("nature"), r.getAs[Int]("time"))).toSeq
      assert(keys === keys.sorted)
    }
  }

  test("exact dedup is survivor-minimal and count-preserving for random duplicated corpora") {
    import spark.implicits._
    (1L to 5L).foreach { run =>
      val n = sample(Gen.choose(5, 40), run)
      val dupFactor = sample(Gen.choose(1, 4), run + 100)
      val seed = mix(run + 7)
      val rows = (1 to n).flatMap { i =>
        val base = s"doc ${mix(seed + i) & 0xffff} body word${i % 7} tail"
        val copies = 1 + bounded(seed + i, 0, dupFactor - 1)
        (0 until copies).map { c =>
          val noisy = if (c % 2 == 1) base.toUpperCase + "  " else base
          (i.toLong * 100 + c, noisy)
        }
      }
      val docs = rows.toDF("doc_id", "text")
      val out = docs
        .select(col("doc_id"), sha2(TextAnalysis.norm(col("text")), 256).as("h"))
        .groupBy("h").agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
        .collect()
      assert(out.length === n) // one survivor per base doc
      assert(out.map(_.getAs[Long]("n_copies")).sum === rows.length.toLong)
      assert(out.forall(_.getAs[Long]("doc_id") % 100 === 0)) // lowest id survives
    }
  }

  test("minhash LSH finds every truly-similar planted pair (random corpora)") {
    import spark.implicits._
    (1L to 3L).foreach { run =>
      val n = sample(Gen.choose(6, 20), run)
      val seed = mix(run + 31)
      val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
      val base = (1 to n).map { i =>
        (i.toLong,
          (0 until 20).map(j => vocab(bounded(seed + i * 31 + j, 0, vocab.length - 1))).mkString(" "))
      }
      val copies = base.take(n / 2).map { case (id, t) =>
        (id + 1000, t.split(" ").updated(0, "changed").mkString(" ")) // 1-token edit
      }
      val docs = (base ++ copies).toDF("doc_id", "text")
      val found = Dedup.nearDuplicates(docs, n = 3, k = 192, b = 64, r = 3, threshold = 0.6)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // every planted pair whose true jaccard clears the threshold must be found
      val sh = TextAnalysis.shingles(docs, 3)
      val planted = copies.map { case (cid, _) => (cid - 1000, cid) }
      val trueJac = Dedup.verifyJaccard(planted.toDF("doc_a", "doc_b"), sh)
        .filter(col("jaccard") >= 0.6)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(trueJac.nonEmpty)
      assert(trueJac.subsetOf(found))
    }
  }

  test("segmentDedup matches a plain-Scala reference on random corpora") {
    import spark.implicits._
    (1L to 4L).foreach { run =>
      val n = sample(Gen.choose(4, 25), run)
      val w = sample(Gen.choose(2, 6), run + 13)
      val seed = mix(run + 53)
      val vocab = Seq("aa", "bb", "cc", "dd", "ee")
      // small vocab + short segments force real cross-doc collisions
      val rows = (1 to n).map { i =>
        val len = 1 + bounded(seed + i * 7, 0, 14)
        (i.toLong,
          (0 until len).map(j => vocab(bounded(seed + i * 31 + j, 0, vocab.length - 1))).mkString(" "))
      }
      val got = Dedup.segmentDedup(rows.toDF("doc_id", "text"), w)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
      // plain-Scala reference: same segmentation, first-occurrence rule
      val segs = rows.flatMap { case (id, text) =>
        text.split(" ").grouped(w).zipWithIndex.map { case (ts, pos) =>
          (id, pos.toLong, ts.mkString(" "))
        }
      }
      val owner = segs.groupBy(_._3).view.mapValues(_.minBy(s => (s._1, s._2))).toMap
      val expected = rows.map { case (id, text) =>
        val mine = segs.filter(_._1 == id)
        val kept = mine.filter(s => owner(s._3) == s).sortBy(_._2)
        id -> (mine.size.toLong, kept.size.toLong, kept.map(_._3).mkString(" "))
      }.toMap
      assert(got === expected, s"run $run (n=$n, w=$w)")
    }
  }

  test("containmentJoin matches a plain-Scala brute force on random corpora") {
    import spark.implicits._
    (1L to 4L).foreach { run =>
      val n = sample(Gen.choose(5, 18), run)
      val seed = mix(run + 97)
      val vocab = Seq("x1", "x2", "x3", "x4", "x5", "x6")
      val rows = (1 to n).map { i =>
        val len = 3 + bounded(seed + i * 11, 0, 20)
        (i.toLong,
          (0 until len).map(j => vocab(bounded(seed + i * 17 + j, 0, vocab.length - 1))).mkString(" "))
      }
      val tau = 0.7
      val got = Dedup.containmentJoin(rows.toDF("doc_id", "text"), n = 3, tau = tau)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // plain-Scala brute force over distinct 3-gram STRING sets (also
      // the collision check for the operator's xxhash64 gram keys)
      val grams = rows.map { case (id, text) =>
        id -> text.split(" ").sliding(3).map(_.mkString(" ")).toSet
      }.toMap
      val expected = (for {
        (a, sa) <- grams; (b, sb) <- grams
        if a != b && sa.nonEmpty &&
          (sa & sb).size.toDouble / sa.size.toDouble >= tau
      } yield (a, b)).toSet
      assert(got === expected, s"run $run (n=$n)")
    }
  }

  test("quantileSketch: sample caps, determinism, and the rank band hold on random groups") {
    import spark.implicits._
    (1L to 3L).foreach { run =>
      val nGroups = sample(Gen.choose(2, 4), run)
      val rowsPer = sample(Gen.choose(50, 400), run + 19)
      val k = 32 // small on purpose: the sample must actually subsample
      val seed = mix(run + 71)
      val rows = for (g <- 1 to nGroups; i <- 1 to rowsPer) yield
        (s"g$g", bounded(seed + g * 100000 + i, 0, 1000000).toDouble, (g * 1000000 + i).toLong)
      val df = rows.toDF("g", "x", "id")
      val qs = Seq(0.25, 0.5, 0.9)
      val est1 = Profiling.quantileSketch(df, col("g"), col("x"), Seq(col("id")), qs, k)
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> (r.getDouble(2), r.getLong(3))).toMap
      val est2 = Profiling.quantileSketch(df, col("g"), col("x"), Seq(col("id")), qs, k)
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> (r.getDouble(2), r.getLong(3))).toMap
      assert(est1 === est2) // deterministic across runs
      val byGroup = rows.groupBy(_._1)
      est1.foreach { case ((g, q), (e, nSamp)) =>
        val xs = byGroup(g).map(_._2).sorted
        assert(nSamp === math.min(k, xs.size).toLong)
        val rank = xs.count(_ <= e).toDouble / xs.size
        val bound = 4.0 * math.sqrt(q * (1 - q) / k) + 1.0 / k
        assert(math.abs(rank - q) <= bound,
          f"run $run $g q=$q: rank $rank%.3f off by more than $bound%.3f")
      }
    }
  }

  test("lmFrequencyScore matches a plain-Scala model on random corpora") {
    import spark.implicits._
    (1L to 3L).foreach { run =>
      val n = sample(Gen.choose(6, 30), run)
      val seed = mix(run + 83)
      val vocab = Seq("w1", "w2", "w3", "w4", "w5", "w6", "w7")
      val rows = (1 to n).map { i =>
        val len = 1 + bounded(seed + i * 13, 0, 12)
        (i.toLong,
          (0 until len).map(j => vocab(bounded(seed + i * 29 + j, 0, vocab.length - 1))).mkString(" "))
      }
      val docs = rows.toDF("doc_id", "text")
      val got = Vocab.lmFrequencyScore(
        docs.filter(col("doc_id") % 3 === 0),
        Vocab.unigramModel(docs.filter(col("doc_id") % 3 =!= 0)))
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      // plain-Scala reference
      val model = rows.filter(_._1 % 3 != 0).flatMap(_._2.split(" "))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      rows.filter(_._1 % 3 == 0).foreach { case (id, text) =>
        val ts = text.split(" ").toSeq
        val expected = (ts.size.toLong,
          ts.count(t => !model.contains(t)).toLong,
          ts.flatMap(model.get).sum)
        assert(got(id) === expected, s"run $run doc $id")
      }
    }
  }

  test("BPE learn+encode matches the plain-Scala reference on random corpora") {
    import spark.implicits._
    import graft.operators.Bpe
    (1L to 4L).foreach { run =>
      // random corpora over a small alphabet so merges are dense enough
      // to chain (long shared prefixes/suffixes across words) and ties
      // actually occur — the tie-break path is the dangerous one
      val nDocs = sample(Gen.choose(4, 12), run)
      val nWords = sample(Gen.choose(4, 10), run + 7)
      val m = sample(Gen.choose(3, 14), run + 17)
      val seed = mix(run + 97)
      val lexicon = (1 to nWords).map { w =>
        val len = 1 + bounded(seed + w * 31, 0, 5)
        (0 until len).map(j => ('a' + bounded(seed + w * 37 + j, 0, 3)).toChar).mkString
      }
      val rows = (1 to nDocs).map { i =>
        val len = bounded(seed + i * 41, 0, 15) // 0 => empty doc
        (i.toLong, (0 until len)
          .map(j => lexicon(bounded(seed + i * 43 + j, 0, lexicon.size - 1)))
          .mkString(" "))
      }
      val docs = rows.toDF("doc_id", "text")
      val wf = BpeReference.refWordFreq(rows)
      val (refRules, refSegs) = BpeReference.refLearn(wf, m)
      val (rules, words) = Bpe.learn(docs, merges = m)
      assert(rules.map(r => (r.rank, r.left, r.right, r.pair_count))
        === refRules, s"run $run (m=$m, lexicon=$lexicon)")
      // the incremental driver loop (the production path) against the
      // same reference, both stopping modes — the heap/delta structure
      // shares nothing with the reference's full recount per round
      Seq(2L, 1L).foreach { mc =>
        val (refR, refS) = BpeReference.refLearn(wf, m, minCount = mc)
        val (locRules, locSegs) = Bpe.learnLocal(wf.toSeq, m, minCount = mc)
        assert(locRules.map(r => (r.rank, r.left, r.right, r.pair_count))
          === refR, s"run $run minCount=$mc (m=$m, lexicon=$lexicon)")
        assert(locSegs.map(ws => ws.word -> ws.syms.toVector).toMap
          === refS, s"run $run minCount=$mc")
      }
      val enc = Bpe.encode(docs, words.select("word", "syms"),
          Bpe.subwordIds(Bpe.subwordVocab(words)))
        .select("doc_id", "n_words", "n_subwords", "ids")
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(enc === BpeReference.refEncode(rows, refSegs, wf), s"run $run")
      words.unpersist()
    }
  }

  test("byte-level BPE matches the byte-level reference on random multi-byte corpora") {
    import spark.implicits._
    import graft.operators.Bpe
    // the alphabet mixes 1-, 2- and 3-byte UTF-8 characters, so the
    // byte decomposition genuinely differs from the code-point one
    // (an ASCII-only corpus would make the two modes coincide and the
    // test vacuous); merges can fuse ACROSS a character's bytes, the
    // regime code-point mode cannot reach
    val alphabet = Vector("a", "b", "é", "ß", "日")
    (1L to 4L).foreach { run =>
      val nDocs = sample(Gen.choose(4, 12), run + 3)
      val nWords = sample(Gen.choose(4, 10), run + 11)
      val m = sample(Gen.choose(3, 14), run + 23)
      val seed = mix(run + 131)
      val lexicon = (1 to nWords).map { w =>
        val len = 1 + bounded(seed + w * 31, 0, 4)
        (0 until len).map(j =>
          alphabet(bounded(seed + w * 37 + j, 0, alphabet.size - 1))).mkString
      }
      val rows = (1 to nDocs).map { i =>
        val len = bounded(seed + i * 41, 0, 15)
        (i.toLong, (0 until len)
          .map(j => lexicon(bounded(seed + i * 43 + j, 0, lexicon.size - 1)))
          .mkString(" "))
      }
      val docs = rows.toDF("doc_id", "text")
      val wf = BpeReference.refWordFreq(rows)
      Seq(2L, 1L).foreach { mc =>
        val (refR, refS) =
          BpeReference.refLearn(wf, m, minCount = mc,
            initial = BpeReference.byteInitial)
        val (locRules, locSegs) =
          Bpe.learnLocal(wf.toSeq, m, minCount = mc, symsOf = Bpe.byteSymsLocal)
        assert(locRules.map(r => (r.rank, r.left, r.right, r.pair_count))
          === refR, s"run $run minCount=$mc (m=$m, lexicon=$lexicon)")
        assert(locSegs.map(ws => ws.word -> ws.syms.toVector).toMap
          === refS, s"run $run minCount=$mc")
      }
      val (_, words) = Bpe.learnCollected(docs, merges = m,
        symsOf = Bpe.byteSymsLocal)
      val ids = Bpe.subwordIds(Bpe.byteVocab(words))
      val enc = Bpe.encodeBytes(docs, words.select("word", "syms"), ids)
      val got = enc.select("doc_id", "n_words", "n_subwords", "ids")
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val (_, refSegs) = BpeReference.refLearn(wf, m,
        initial = BpeReference.byteInitial)
      assert(got === BpeReference.refEncode(rows, refSegs, wf,
        initial = BpeReference.byteInitial,
        baseSymbols = BpeReference.refByteChar :+ Bpe.ByteEndOfWord), s"run $run")
      // universal round trip on the random corpus
      val dec = Bpe.decodeBytes(enc, ids).as[(Long, String)].collect().toMap
      val want = rows.map { case (id, t) =>
        id -> t.replaceAll("\\s+", " ").trim.toLowerCase
      }.toMap
      assert(dec === want, s"run $run decode round trip")
    }
  }

  test("histogram conserves row count and never bins outside [0, nBins) (random data)") {
    import spark.implicits._
    (1L to 5L).foreach { run =>
      val n = sample(Gen.choose(20, 400), run)
      val nBins = sample(Gen.choose(1, 24), run + 50)
      val seed = mix(run + 77)
      val df = (1 to n).map(i =>
        (s"g${bounded(seed + i, 0, 2)}", bounded(seed * 7 + i, -5000, 5000) / 37.0))
        .toDF("g", "x")
      val bins = Profiling.histogram(df, col("g"), col("x"), nBins)
        .collect().map(r => (r.getInt(1), r.getLong(2)))
      assert(bins.map(_._2).sum === n.toLong)
      assert(bins.forall { case (b, _) => b >= 0 && b < nBins })
    }
  }

  test("weightedSample emits min(k, group size) rows per group, all from the group (random data)") {
    import spark.implicits._
    (1L to 5L).foreach { run =>
      val n = sample(Gen.choose(10, 300), run)
      val k = sample(Gen.choose(1, 12), run + 9)
      val seed = mix(run + 13)
      val df = (1 to n).map(i =>
        (s"s${bounded(seed + i, 0, 3)}", i.toLong, bounded(seed * 3 + i, 1, 99).toLong))
        .toDF("source", "doc_id", "w")
      val got = Sampling.weightedSample(df, col("source"), col("doc_id"), col("w"), k)
        .select("source", "doc_id")
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val groupSizes = df.groupBy("source").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val bySource = got.groupBy(_._1)
      groupSizes.foreach { case (s, sz) =>
        assert(bySource.getOrElse(s, Array.empty).length === math.min(k.toLong, sz).toInt)
      }
      // sampled ids really belong to their group
      val membership = df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got.forall(membership.contains))
    }
  }

  test("overlapSelfJoin is exact for random intervals at random cell widths") {
    import spark.implicits._
    (1L to 4L).foreach { run =>
      val n = sample(Gen.choose(20, 150), run)
      val cell = sample(Gen.choose(7L, 500L), run + 3)
      val seed = mix(run + 41)
      val iv = (1 to n).map { i =>
        val s = bounded(seed + i, -2000, 2000).toLong
        (i.toLong, bounded(seed * 5 + i, 0, 4).toLong, s, s + bounded(seed * 9 + i, 0, 900))
      }.toDF("id", "key", "s", "e")
      val got = Intervals.overlapSelfJoin(iv, cell)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val a = iv.alias("a"); val b = iv.alias("b")
      val brute = a.join(b,
          col("a.key") === col("b.key") && col("a.id") < col("b.id") &&
          col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
        .select(col("a.key"), col("a.id"), col("b.id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got.toSet === brute)
      assert(got.length === brute.size) // exactly-once, no multi-cell dups
    }
  }

  test("chunking reconstructs every random document exactly at random window/stride") {
    import spark.implicits._
    (1L to 8L).foreach { run =>
      val seed = mix(run)
      val w = bounded(seed, 2, 40)
      val s = bounded(seed + 1, 1, w) // stride in [1, window]
      val docs = (1 to bounded(seed + 2, 1, 12)).map { i =>
        val n = bounded(seed + 3 * i, 1, 120)
        (i.toLong, (1 to n).map(t => s"w${mix(seed + i * 131 + t) % 50}").mkString(" "))
      }
      val got = graft.operators.Shards.chunkOverlap(docs.toDF("doc_id", "text"), w, s)
        .as[(Long, Int, Int, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      docs.foreach { case (id, text) =>
        val toks = text.split(" ", -1)
        val chunks = got(id)
        // count, boundaries, and content all from first principles
        assert(chunks.length === 1 + (toks.length - 1) / s, s"run $run doc $id")
        chunks.foreach { case (_, i, n, c) =>
          val win = toks.slice(i * s, math.min(i * s + w, toks.length))
          assert(n === win.length && c === win.mkString(" "), s"run $run doc $id chunk $i")
        }
        // stride-prefix concatenation reproduces the document exactly
        val rebuilt = chunks.init.map(_._4.split(" ", -1).take(s)).flatten ++
          chunks.last._4.split(" ", -1)
        assert(rebuilt.toSeq === toks.toSeq, s"run $run doc $id rebuild")
      }
    }
  }

  test("CDC latest-per-key equals the brute force for random version logs") {
    import spark.implicits._
    (1L to 8L).foreach { run =>
      val seed = mix(run)
      val nKeys = bounded(seed, 1, 8)
      val log = (1 to bounded(seed + 1, 1, 120)).map { i =>
        (bounded(seed + 2 * i, 1, nKeys).toLong,
          bounded(seed + 3 * i, 0, 20).toLong, // coarse ts: many ties
          i.toLong, s"t${i % 3}", i.toDouble)
      }
      val got = graft.operators.SnapshotDiff.latestByKey(
          log.toDF("user_id", "ts", "event_id", "event_type", "value"),
          key = Seq("user_id"), ts = "ts", tiebreak = "event_id",
          payload = Seq("event_type", "value"))
        .select("user_id", "last_ts", "last_event_id", "last_event_type",
          "last_value", "n_versions")
        .as[(Long, Long, Long, String, Double, Long)].collect().sortBy(_._1)
      val expect = log.groupBy(_._1).toArray.sortBy(_._1).map { case (u, rs) =>
        val (_, ts, id, tpe, v) = rs.maxBy(r => (r._2, r._3))
        (u, ts, id, tpe, v, rs.length.toLong)
      }
      assert(got === expect, s"run $run")
    }
  }
}
