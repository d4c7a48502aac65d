package graft

import org.apache.spark.sql.functions._

import graft.operators.NnDescent

/** Ad-hoc per-round cost decomposition for the q146 build at the 10×
  * stress tier (run via `Test/runMain graft.NnRoundProbe`): times
  * `build(rounds = r)` for increasing fixed budgets, so consecutive
  * differences isolate the marginal cost of each refinement round —
  * the evidence separating fixed scheduling floor from data-linear
  * round cost when adjudicating the stress-ratio rows. */
object NnRoundProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-nn-round-probe")
    val emb = spark.read
      .parquet("target/stress_sf1_s9999999_v4/embeddings.parquet")
      .localCheckpoint(true)
    val n = emb.count()
    println(s"PROBE n=$n autoRounds=${NnDescent.autoRounds(n)}")
    var prev = 0.0
    Seq(0, 2, 4, 6, 8).foreach { r =>
      val t0 = System.nanoTime()
      NnDescent.build(emb, rounds = r, nKnown = n).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"PROBE rounds=$r%d total=$t%.2f s marginal=${t - prev}%.2f s")
      prev = t
    }
    spark.stop()
  }
}
