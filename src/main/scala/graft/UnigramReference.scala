package graft

import graft.operators.{Bpe, Unigram}

/** Plain single-node Scala reference implementation of the unigram-LM
  * tokenizer spec (Kudo 2018 EM + loss pruning + Viterbi) — the
  * differential oracle for q143/q144 (no DuckDB oracle exists: an EM
  * fixed point is not SQL). Implements the CONTRACT documented on
  * [[graft.operators.Unigram]] — seed rule, fixed accumulation order
  * (words in code-point order, lattice edges (start ASC, length ASC)),
  * exact-tie Viterbi preferring the longer piece, SentencePiece
  * loss-if-removed pruning with the Shrink schedule — but with
  * deliberately different machinery: words are INT code-point arrays
  * (not string vectors), lattices are materialized edge lists, the
  * forward/backward pass runs over those edges, and Viterbi maximizes
  * over a candidate list instead of in-place replacement. Bit-equality
  * of the trained vocabulary then checks the spec, not shared code. */
object UnigramReference {

  private val MaxLen = Unigram.MaxPieceLen
  private val Seed = Unigram.SeedFactor
  private val Shrink = Unigram.Shrink
  private val Iters = Unigram.EmIters

  private def toCps(w: String): Array[Int] = w.codePoints().toArray

  private def piece(w: Array[Int], i: Int, l: Int): String =
    new String(w, i, l)

  /** One lattice edge: [i, i+l) labelled with its piece string. */
  private final case class Edge(i: Int, l: Int, p: String)

  private def edges(w: Array[Int]): Vector[Edge] =
    (for {
      i <- 0 until w.length
      l <- 1 to math.min(MaxLen, w.length - i)
    } yield Edge(i, l, piece(w, i, l))).toVector // (i ASC, l ASC)

  private def lse(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else math.max(a, b) + math.log1p(math.exp(-math.abs(a - b)))

  /** Viterbi under the contract's tie rule: max score, exact ties go
    * to the longer piece at the current position. Candidate-list
    * formulation (collect, then reduce) — not the engine's in-place
    * scan. */
  private def viterbiRef(w: Array[Int], lp: Map[String, Double],
      ban: String): Option[(Double, List[String])] = {
    val n = w.length
    val score = Array.fill(n + 1)(Double.NegativeInfinity)
    val pick = new Array[Int](n + 1)
    score(n) = 0.0d
    for (i <- (n - 1) to 0 by -1) {
      val cands = for {
        l <- 1 to math.min(MaxLen, n - i)
        p = piece(w, i, l)
        if p != ban && score(i + l) != Double.NegativeInfinity
        v <- lp.get(p)
      } yield (v + score(i + l), l)
      if (cands.nonEmpty) {
        // max by (score, then length) — the longer piece wins ties
        val (s, l) = cands.reduceLeft { (x, y) =>
          if (y._1 > x._1 || (y._1 == x._1 && y._2 > x._2)) y else x
        }
        score(i) = s
        pick(i) = l
      }
    }
    if (score(0) == Double.NegativeInfinity) None
    else {
      var p = 0
      val b = List.newBuilder[String]
      while (p < n) { b += piece(w, p, pick(p)); p += pick(p) }
      Some((score(0), b.result()))
    }
  }

  private def emPass(words: Seq[(Array[Int], Long)],
      lp: Map[String, Double]): Map[String, Double] = {
    val exp = scala.collection.mutable.LinkedHashMap[String, Double]()
    for ((w, f) <- words) {
      val n = w.length
      val es = edges(w)
      val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
      alpha(0) = 0.0d
      for (e <- es; v <- lp.get(e.p)
           if alpha(e.i) != Double.NegativeInfinity)
        alpha(e.i + e.l) = lse(alpha(e.i + e.l), alpha(e.i) + v)
      val beta = Array.fill(n + 1)(Double.NegativeInfinity)
      beta(n) = 0.0d
      // edges sorted by start DESC for the backward pass; within a
      // start, the (l ASC) order matches the engine's inner loop
      for (e <- es.sortBy(e => -e.i); v <- lp.get(e.p)
           if beta(e.i + e.l) != Double.NegativeInfinity)
        beta(e.i) = lse(beta(e.i), v + beta(e.i + e.l))
      val z = alpha(n)
      if (z != Double.NegativeInfinity)
        for (e <- es; v <- lp.get(e.p)
             if alpha(e.i) != Double.NegativeInfinity &&
               beta(e.i + e.l) != Double.NegativeInfinity)
          exp(e.p) = exp.getOrElse(e.p, 0.0d) +
            math.exp(alpha(e.i) + v + beta(e.i + e.l) - z) * f
    }
    val keys = lp.keys.toSeq.sorted(Bpe.Utf8Order)
    var tot = 0.0d
    keys.foreach(k => tot += exp.getOrElse(k, 0.0d))
    keys.map { k =>
      val c = exp.getOrElse(k, 0.0d)
      k -> (if (c > 0.0d) math.log(c) - math.log(tot) else -1e9d)
    }.toMap
  }

  /** Train per the spec; returns (piece → logp in final id order,
    * word → pieces (marker appended)). */
  def learn(wordFreq: Seq[(String, Long)], vocabSize: Int)
      : (Seq[(String, Double)], Map[String, List[String]]) = {
    val words = wordFreq.filter(_._1.nonEmpty)
      .sortBy(_._1)(Bpe.Utf8Order)
      .map { case (w, f) => (toCps(w), f) }
    val counts = scala.collection.mutable.LinkedHashMap[String, Double]()
    for ((w, f) <- words; e <- edges(w))
      counts(e.p) = counts.getOrElse(e.p, 0.0d) + f.toDouble
    val singles = words.flatMap(w => w._1.map(cp => new String(Character.toChars(cp))))
      .distinct.sorted(Bpe.Utf8Order)
    val multis = counts.toSeq
      .filter { case (p, c) => toCps(p).length > 1 && c >= 2.0d }
      .sortBy { case (p, c) => (-c, p) }(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Bpe.Utf8Order))
      .map(_._1)
      .take(math.max(0, Seed * vocabSize - singles.size))
    var vocab = (singles ++ multis).sorted(Bpe.Utf8Order)
    val tot = vocab.iterator.map(counts(_)).sum
    var lp: Map[String, Double] =
      vocab.map(p => p -> (math.log(counts(p)) - math.log(tot))).toMap

    var guard = 0
    var go = true
    while (go) {
      for (_ <- 1 to Iters) lp = emPass(words, lp)
      if (vocab.size <= vocabSize || guard >= 64) go = false
      else {
        guard += 1
        val loss = scala.collection.mutable.LinkedHashMap[String, Double]()
        for ((w, f) <- words; res <- viterbiRef(w, lp, null);
             p <- res._2.distinct.sorted(Bpe.Utf8Order)
             if toCps(p).length > 1) {
          val alt = viterbiRef(w, lp, p).map(_._1)
            .getOrElse(Double.NegativeInfinity)
          val d = if (alt == Double.NegativeInfinity) Double.MaxValue / 1e6
            else (res._1 - alt) * f
          loss(p) = loss.getOrElse(p, 0.0d) + d
        }
        val fixedSet = singles.toSet
        val (fixed, prunable) = vocab.partition(fixedSet.contains)
        val keepN = math.max(vocabSize - fixed.size,
          math.ceil(prunable.size * Shrink).toInt - 1)
        val kept = prunable
          .sortBy(p => (-loss.getOrElse(p, 0.0d), p))(
            Ordering.Tuple2(Ordering.Double.TotalOrdering, Bpe.Utf8Order))
          .take(math.max(0, keepN))
        val next = (fixed ++ kept).sorted(Bpe.Utf8Order)
        if (next.size == vocab.size) guard = 64
        vocab = next
        lp = lp.filter { case (k, _) => vocab.contains(k) }
      }
    }
    val ranked = vocab.map(p => (p, lp(p)))
      .sortBy { case (p, v) => (-v, p) }(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Bpe.Utf8Order))
    val segs = words.map { case (w, f) =>
      new String(w, 0, w.length) ->
        (viterbiRef(w, lp, null).map(_._2).getOrElse(
          w.map(cp => new String(Character.toChars(cp))).toList)
          :+ Bpe.EndOfWord)
    }.toMap
    (ranked, segs)
  }
}
