package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Cross-process-safe write-once stage materialization — the shared
  * build discipline behind every fingerprinted parquet artifact in the
  * engine (BPE tokenizer, ANN indexes, ingest-gate corpus index,
  * pipeline stages, layout fixtures).
  *
  * The round-9 pattern — build components in place, then write a root
  * `_SUCCESS` marker last — is safe against crashes (a half-built stage
  * has no marker and is rebuilt) and against same-JVM races (builders
  * `synchronized`), but two *processes* sharing `target/` could race:
  * one reads a half-built component directory after the other creates
  * the root mid-write (round-9 advice). This helper closes that window
  * with the standard commit-by-rename protocol:
  *
  *   1. build every component under a private temp root
  *      (`<out>.tmp-<nonce>`) that no reader ever probes;
  *   2. write the root `_SUCCESS` marker inside the temp root, AFTER
  *      all component writes — the finished-stage invariant;
  *   3. `rename(tmp, out)` — one filesystem metadata operation
  *      (atomic on POSIX and HDFS). Readers see either nothing or the
  *      complete finished stage, never an intermediate state.
  *
  * Residual window (documented, not closed — this is a lock-free
  * protocol): a concurrent commit landing between the pre-delete
  * `_SUCCESS` re-check and the delete (or between the pre-rename check
  * and the rename, where a losing rename nests its temp root inside
  * the winner's commit as an orphan subdirectory) is a two-metadata-op
  * window. Content-fingerprinted keys make every competing build
  * byte-equivalent, so the served stage is correct in all interleavings;
  * the final marker `require` refuses to serve a destination that holds
  * no finished stage.
  *
  * If the rename fails because a concurrent builder won the race, the
  * loser discards its temp root and serves the winner's stage — both
  * builders computed the same content-fingerprinted artifact, so either
  * result is correct. Same-JVM duplicate builds are still elided by the
  * caller's `synchronized`; this helper adds only the cross-process
  * commit discipline.
  *
  * At cluster scale the same protocol holds on any store with atomic
  * directory rename (HDFS, POSIX NFS); object stores without it would
  * swap this for a manifest-pointer commit — the rename is isolated
  * here precisely so that swap is one function. */
object Staging {

  /** Absolute form of a staged-artifact root, for embedding in oracle
    * SQL. The DuckDB oracle harness runs from a DIFFERENT working
    * directory than the builder, so a relative `target/...` glob in the
    * oracle text resolves to nothing there (the round-14 regression:
    * 16 entries erred on exactly this). Every oracle-root variable must
    * store this form, never the raw relative staging path. */
  def abs(path: String): String = new java.io.File(path).getAbsolutePath

  /** One lock object per stage path — same-JVM build serialization is
    * PER STAGE, not global (round-10 advice: callers' object-level
    * `synchronized` serialized builders of unrelated stages behind one
    * monitor). Never pruned: bounded by the number of distinct stage
    * paths a session touches, each entry a bare Object. */
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Idempotently ensure the finished stage at `out`: if its root
    * `_SUCCESS` marker is absent, run `build(tmpRoot)` (which must
    * write every component under the given temp root) and commit via
    * atomic rename. Same-JVM callers of the SAME stage serialize here
    * (duplicate-build elision — callers need no `synchronized` of their
    * own); different stages build concurrently. Returns `out`. */
  def ensure(spark: SparkSession, out: String)(build: String => Unit): String =
    locks.computeIfAbsent(out, _ => new Object).synchronized {
      ensureLocked(spark, out)(build)
    }

  private def ensureLocked(spark: SparkSession, out: String)(build: String => Unit): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(out)
    val fs = root.getFileSystem(conf)
    val ok = new Path(out, "_SUCCESS")
    if (!fs.exists(ok)) {
      // markerless residue at the root (a crashed pre-rename-era build)
      // is never served by anyone — clear it so the commit rename finds
      // no destination (Hadoop's local rename would otherwise NEST the
      // temp root inside an existing directory instead of replacing it).
      // The marker is RE-CHECKED immediately before the delete (round-10
      // advice): between the outer exists(ok) and here, a concurrent
      // process may have committed a finished stage, and deleting it
      // would remove an artifact cross-process readers could be
      // mid-scan. The re-check shrinks the lost-commit window from the
      // whole build to two adjacent metadata ops; a commit landing
      // inside THAT window is the residual race documented below.
      if (fs.exists(root) && !fs.exists(ok)) fs.delete(root, true)
      // if the re-check saw a concurrent commit, serve it instead of
      // running a full build only to discard it at the pre-rename check
      // (a staged build can be minutes of training at scale)
      if (fs.exists(ok)) return out
      // nanoTime + thread id: unique enough for concurrent builders of
      // the same stage without polluting the content-keyed namespace
      val tmp = new Path(
        s"$out.tmp-${java.lang.Thread.currentThread.getId}-${System.nanoTime}")
      try {
        build(tmp.toString)
        fs.create(new Path(tmp, "_SUCCESS")).close()
        Option(root.getParent).foreach(fs.mkdirs(_))
        if (!fs.exists(ok)) {
          // (a concurrent winner committing in exactly this window would
          // be nested-into by the rename — the residual theoretical race
          // of a lock-free protocol; both artifacts are content-equal,
          // and the window is one metadata op wide vs. the whole build
          // before this helper existed)
          if (!fs.rename(tmp, root)) {
            // rename refused: either a concurrent process committed
            // first (serve its stage) or a real failure (surface it)
            require(fs.exists(ok),
              s"stage commit failed and no finished stage exists at $out")
          }
        }
      } finally {
        if (fs.exists(tmp)) fs.delete(tmp, true)
      }
      // serve nothing unverified: whichever branch ran (our rename, a
      // skipped rename behind a winner, or a losing rename that nested
      // the temp root inside a winner's commit), the destination must
      // hold the finished-stage marker before any caller reads it
      require(fs.exists(ok), s"no finished stage marker at $out after commit")
    }
    out
  }
}
