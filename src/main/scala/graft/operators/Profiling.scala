package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Query
import graft.sources.Tables

/** Data-profiling primitives — the audit pass a pipeline runs over a new
  * corpus drop before any training job trusts it (value distributions,
  * outlier mass, per-source drift).
  *
  * The equi-width histogram is the canonical two-pass distributed shape:
  *
  *   - pass 1: global `min`/`max` of the measure — a partial aggregate
  *     that reduces to ONE row on the map side, so the "pass" costs a
  *     scan and a one-row exchange;
  *   - pass 2: the one-row bounds frame is broadcast (a `crossJoin`
  *     against a 1-row broadcast is a map-side literal injection, not a
  *     join), every row computes its bin with pure double arithmetic,
  *     and one map-side-combining aggregate counts per (group, bin).
  *
  * No driver round-trip (`collect`/`head`) — the bounds stay inside the
  * plan, so the whole thing is two jobs at ANY scale and the bin math is
  * engine-exact: IEEE double subtraction/division/floor are identical in
  * Spark and DuckDB, which the oracle checks bit-for-bit.
  */
object Profiling {

  /** Sparse equi-width histogram of `x` per `group`: (group, bin, n,
    * lo, hi) with `bin` in [0, nBins); empty bins are not emitted.
    * Rows at `x = max` clamp into the last bin; a constant column
    * (max == min) degenerates to one bin 0 holding every row. */
  def histogram(df: DataFrame, group: Column, x: Column, nBins: Int): DataFrame = {
    require(nBins > 0, s"nBins must be positive: $nBins")
    val bounds = df.agg(min(x).as("__lo"), max(x).as("__hi"))
    val width = (col("__hi") - col("__lo")) / nBins
    val bin = when(col("__hi") === col("__lo"), 0)
      .otherwise(least(floor((x - col("__lo")) / width).cast("int"), lit(nBins - 1)))
    df.crossJoin(broadcast(bounds))
      .groupBy(group.as("g"), bin.as("bin"))
      .agg(count(lit(1)).as("n"))
  }

  val queries: Seq[Query] = Seq(
    Query(
      "q46_histogram",
      "Per-return-flag equi-width histogram (16 bins) of l_extendedprice: " +
        "two-pass distributed profiling — a one-row min/max aggregate " +
        "broadcast back into a map-side bin projection feeding one " +
        "map-side-combining count. No driver round-trip; bin arithmetic is " +
        "IEEE-double exact in both engines, so the oracle checks the bin " +
        "assignment itself, not just totals.",
      (s, dir) =>
        histogram(Tables.lineitem(s, dir), col("l_returnflag"),
            col("l_extendedprice"), nBins = 16)
          .select(col("g").as("l_returnflag"), col("bin"), col("n"))
          .orderBy("l_returnflag", "bin"),
      Some("""
        WITH b AS (
          SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi FROM lineitem
        )
        SELECT l_returnflag,
               CASE WHEN hi = lo THEN 0
                    ELSE LEAST(CAST(FLOOR((l_extendedprice - lo) / ((hi - lo) / 16)) AS INT), 15)
               END AS bin,
               COUNT(*) AS n
        FROM lineitem, b
        GROUP BY 1, 2
        ORDER BY l_returnflag, bin"""))
  )
}
