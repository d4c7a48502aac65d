package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = GraftSession.local("graft-verify")
    new java.io.File(outDir).mkdirs()
    // Optional subset for local iteration (comma-separated names); the
    // driver sets no env, so its runs always cover the full catalog.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_QUERIES")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    only.foreach(o => o.diff(selected.keySet).foreach(n =>
      System.err.println(s"[verify] unknown query requested: $n")))
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, String]
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case scala.util.control.NonFatal(e) =>
        // Round-6 lesson: a swallowed failure left NO row in the
        // driver's CORRECTNESS json — indistinguishable from "not
        // implemented". Leave a per-query `_ERROR` marker (the output
        // dir exists but holds no parquet → the driver's read fails →
        // it records `err`, not an omission) and aggregate to
        // failed.json for the next round's judge. NonFatal: a poisoned
        // JVM (OOM) must abort, not keep "verifying". The marker write
        // itself is best-effort — listFiles() is null when the dir
        // could not be created (stray file, disk full), and one
        // unwritable marker must not kill the remaining queries.
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed(name) = s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}"
        try {
          val d = new java.io.File(s"$outDir/$name")
          d.mkdirs()
          Option(d.listFiles()).foreach(_.foreach(f => if (f.isFile) f.delete()))
          Files.writeString(Paths.get(s"$outDir/$name/_ERROR"), failed(name))
        } catch { case scala.util.control.NonFatal(e2) =>
          System.err.println(s"[verify] $name: could not write _ERROR marker: ${e2.getMessage}")
        }
      }
      // several operators persist barrier frames (q17/q28 candidates,
      // q20 buckets); drop them once the query's output is written so 28
      // sequential queries don't accumulate session-lifetime cache
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Dump-time audit (round-13 advice): every entry whose oracle is a
    // late-bound thunk over a staged root (Query.oracleFn) must have
    // RESOLVED by now — its run stages the artifact and sets the root,
    // so a None here means the oracle silently degraded to a rows-only
    // check. Record it as a failure (the driver's CORRECTNESS json then
    // carries an err row, not a quiet no_oracle downgrade). Entries
    // that already failed their run are exempt — the run failure is the
    // signal there.
    selected.keySet.foreach { name =>
      SparkEntry.catalog.find(_.name == name).foreach { entry =>
        if (entry.oracleFn.isDefined && entry.oracleNow.isEmpty &&
            !failed.contains(name))
          failed(name) = "oracle-gated entry resolved no oracle SQL after " +
            "its run (staged root never set — see Query.oracleFn)"
        // Round-14 regression class: a resolved oracle whose
        // read_parquet globs are relative or match no files passes
        // here but errors in the driver's DuckDB (different cwd).
        // Audit readability-from-another-cwd, not just presence.
        if (!failed.contains(name))
          entry.oracleNow.foreach { sql =>
            val probs = OracleAudit.problems(sql)
            if (probs.nonEmpty) failed(name) = probs.mkString("; ")
          }
      }
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val failedJson = failed.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/failed.json"), failedJson)
    spark.stop()
  }
}
