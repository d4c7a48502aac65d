package graft

import graft.operators.Bpe

/** Ad-hoc scaling probe for the O(1)-job BPE driver loop — NOT part of
  * the test suite (run via `Test/runMain graft.BpeScaleProbe [nWords]
  * [merges]`). Times [[Bpe.learnLocal]] on a large high-entropy word
  * table to back the scaladoc claim that a production merge budget over
  * a web-scale (Heaps'-bounded, ~10^6–10^7 distinct words) table is
  * minutes of single-threaded driver CPU.
  *
  * The word table here is synthetic BY DESIGN: this probes the
  * incremental pair-count data structure, not query semantics — catalog
  * entries only ever consume the driver-generated testdata, whose
  * 31-word vocabulary cannot exercise a production merge budget
  * (the q104 scaladoc's fixture-saturation note). Deterministic seed so
  * runs are comparable across rounds. */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val nWords = args.headOption.map(_.toInt).getOrElse(1000000)
    val merges = if (args.length > 1) args(1).toInt else 32768
    val rnd = new scala.util.Random(42)
    // zipf-ish frequencies over random 3–12 letter words: high pair
    // entropy (merges stay sustained deep into the budget) and a
    // realistic long-tail frequency profile
    val words = new Array[(String, Long)](nWords)
    val seen = scala.collection.mutable.HashSet.empty[String]
    var i = 0
    while (i < nWords) {
      val len = 3 + rnd.nextInt(10)
      val w = (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      if (seen.add(w)) {
        words(i) = (w, math.max(1L, (nWords.toDouble / (i + 1)).toLong))
        i += 1
      }
    }
    val totalSyms = words.iterator.map(_._1.length + 1L).sum
    println(s"[probe] $nWords words, $totalSyms symbols, budget $merges merges")
    val t0 = System.nanoTime()
    val (rules, _) = Bpe.learnLocal(words.toSeq, merges, minCount = 2L)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[probe] learned ${rules.size} merges in $sec%.1f s driver-side " +
      f"(${rules.size / sec}%.0f merges/s), zero Spark jobs")
  }
}
