package graft

import graft.operators.Bpe

/** Plain single-node Scala reference implementation of Sennrich et al.
  * 2016 BPE — the differential oracle for the q102/q103/q104 operators
  * (no DuckDB oracle exists: the per-round argmax is not a recursive
  * CTE). Deliberately the NAIVE formulation — full pair recount every
  * round, no incremental structure, no heap — so it shares no shape
  * with either engine path (the distributed aggregate loop or the
  * incremental driver loop). Shared by the fixture/real-corpus gates in
  * `BpeSpec` and the randomized sweep in `PropertySpec`.
  *
  * Unicode contract (matches both engine paths): symbols are CODE
  * POINTS (Spark's `substr`/`length` string semantics — not UTF-16
  * code units, which would split supplementary characters into lone
  * surrogates), and argmax ties break in code point order (= UTF-8
  * binary order = Spark's string ordering; plain `String.compareTo`
  * would order supplementary characters below U+E000). */
object BpeReference {

  /** Code point order — an independent implementation of the tie-break
    * (compare code point sequences, not UTF-16 units like
    * `String.compareTo`, not UTF-8 bytes like the engine's). */
  val cpOrder: Ordering[String] = (x: String, y: String) => {
    val a = x.codePoints().toArray
    val b = y.codePoints().toArray
    var i = 0
    var r = 0
    while (r == 0 && i < a.length && i < b.length) {
      r = Integer.compare(a(i), b(i))
      i += 1
    }
    if (r != 0) r else Integer.compare(a.length, b.length)
  }

  private def cpSyms(w: String): Vector[String] =
    w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))

  /** Default initial symbol sequence: code points + the end marker. */
  val cpInitial: String => Vector[String] =
    w => cpSyms(w) :+ Bpe.EndOfWord

  /** Independent construction of the GPT-2 byte→unicode table (the
    * `bytes_to_unicode` bijection): printable byte values keep their
    * code point; the rest get 256, 257, … in ascending byte order.
    * Built pair-sort-style — deliberately a different shape from the
    * engine's sequential-scan construction. */
  val refByteChar: Vector[String] = {
    val printable = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toVector
    val extra = (0 to 255).filterNot(printable.contains)
    (printable.map(b => b -> b) ++
      extra.zipWithIndex.map { case (b, i) => b -> (256 + i) })
      .sortBy(_._1).map { case (_, cp) => new String(Character.toChars(cp)) }
      .toVector
  }

  /** Byte-level initial symbol sequence: UTF-8 bytes through
    * [[refByteChar]] + the end marker. */
  val byteInitial: String => Vector[String] =
    w => w.getBytes(java.nio.charset.StandardCharsets.UTF_8).toVector
      .map(b => refByteChar(b & 0xff)) :+ Bpe.ByteEndOfWord

  def refTokens(text: String): Vector[String] =
    text.replaceAll("\\s+", " ").trim.toLowerCase.split(" ", -1).toVector

  def refApply(ss: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < ss.length) {
      if (i + 1 < ss.length && ss(i) == a && ss(i + 1) == b) { out += (a + b); i += 2 }
      else { out += ss(i); i += 1 }
    }
    out.result()
  }

  def refWordFreq(docs: Seq[(Long, String)]): Map[String, Long] =
    docs.flatMap { case (_, t) => refTokens(t) }
      .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }

  def refLearn(wordFreq: Map[String, Long], m: Int, minCount: Long = 2L,
      initial: String => Vector[String] = cpInitial)
      : (Vector[(Int, String, String, Long)], Map[String, Vector[String]]) = {
    var segs: Map[String, Vector[String]] = wordFreq.map { case (w, _) =>
      w -> initial(w)
    }
    val rules = Vector.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= m && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, f) <- wordFreq; win <- segs(w).sliding(2) if win.size == 2)
        counts((win(0), win(1))) = counts.getOrElse((win(0), win(1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.minBy { case ((a, b), c) => (-c, a, b) }(
          Ordering.Tuple3(Ordering.Long, cpOrder, cpOrder))
        if (c < minCount) done = true
        else {
          rules += ((rank, a, b, c))
          segs = segs.map { case (w, ss) => w -> refApply(ss, a, b) }
          rank += 1
        }
      }
    }
    (rules.result(), segs)
  }

  def refEncode(docs: Seq[(Long, String)], segs: Map[String, Vector[String]],
      wordFreq: Map[String, Long],
      initial: String => Vector[String] = cpInitial,
      baseSymbols: Seq[String] = Nil): Map[Long, (Long, Long, String)] = {
    val counts = scala.collection.mutable.Map.empty[String, Long]
    for ((w, f) <- wordFreq; s <- segs(w))
      counts(s) = counts.getOrElse(s, 0L) + f
    // byte mode seeds the vocabulary with the whole base alphabet at
    // count 0 (never-seen symbols sort after every observed one)
    for (s <- baseSymbols if !counts.contains(s)) counts(s) = 0L
    val tid = counts.toSeq
      .sortBy { case (s, n) => (-n, s) }(Ordering.Tuple2(Ordering.Long, cpOrder))
      .zipWithIndex.map { case ((s, _), i) => s -> (i + 1) }.toMap
    docs.map { case (id, text) =>
      val ws = refTokens(text)
      val subs = ws.flatMap(w => segs.getOrElse(w, initial(w)))
      (id, (ws.size.toLong, subs.size.toLong,
        subs.map(s => tid.getOrElse(s, 0)).mkString(" ")))
    }.toMap
  }
}
