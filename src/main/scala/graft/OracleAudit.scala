package graft

import java.nio.file.{Files, FileSystems, Paths}

/** Dump-time audit of oracle SQL file references (round-14 advice).
  *
  * The driver's DuckDB compare runs from a DIFFERENT working directory
  * than the builder's Verify run, so any `read_parquet('target/...')`
  * glob that is relative — or absolute but matching zero files —
  * errors there even though the builder's local replay passed. Round
  * 14 shipped 16 such entries. This audit runs right after the dump,
  * in the builder's JVM where the staged artifacts exist, and fails
  * the entry into `failed.json` instead of letting the driver discover
  * the broken path a round later.
  */
object OracleAudit {

  // the path may be followed by options, e.g.
  // read_parquet('.../*.parquet', hive_partitioning=1)
  private val ReadParquet = """read_parquet\('([^']+)'""".r

  /** Every parquet glob referenced by the oracle SQL. */
  def globsOf(sql: String): Seq[String] =
    ReadParquet.findAllMatchIn(sql).map(_.group(1)).toSeq

  /** Problems with the SQL's file references: relative paths (the
    * driver's cwd differs) and globs matching zero files on disk.
    * Empty = clean. */
  def problems(sql: String): Seq[String] =
    globsOf(sql).flatMap { g =>
      if (!Paths.get(g).isAbsolute)
        Some(s"relative oracle glob '$g' (driver's DuckDB runs from a different cwd)")
      else if (!globMatches(g))
        Some(s"oracle glob '$g' matches no files on disk")
      else None
    }

  /** Does `pattern` (a path that may contain `*`/`?`/`[]`/`{}` glob
    * segments) match at least one existing file? Walks the longest
    * glob-free directory prefix — the staged-artifact roots this
    * guards are small (tens of files), so the walk is trivial. */
  def globMatches(pattern: String): Boolean = {
    val firstGlob = pattern.indexWhere(c => "*?[{".indexOf(c) >= 0)
    if (firstGlob < 0) return Files.exists(Paths.get(pattern))
    val slash = pattern.lastIndexOf('/', firstGlob)
    if (slash < 0) return false
    val base = Paths.get(pattern.substring(0, slash))
    if (!Files.isDirectory(base)) return false
    val matcher = FileSystems.getDefault.getPathMatcher("glob:" + pattern)
    val stream = Files.walk(base)
    try stream.anyMatch(p => matcher.matches(p))
    finally stream.close()
  }
}
