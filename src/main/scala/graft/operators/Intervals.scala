package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Query
import graft.sources.Tables

/** Interval-overlap join — the temporal generalization of the q30
  * point-in-range join: find all pairs of intervals (same partition key)
  * that overlap, without ever forming an inequality cross product.
  *
  * Grid bucketization (the standard spatial/temporal join technique,
  * e.g. DeWitt et al.'s partition-based spatial merge): tile the time
  * axis into fixed cells, replicate each interval into every cell it
  * touches (`sequence(s div W, e div W)` — replication factor is
  * ⌈len/W⌉+1, bounded when W is chosen near the typical interval
  * length), then pairs can only overlap if they share a cell, so the
  * candidate join is a plain EQUI-join on (key, cell) — shuffle-
  * partitionable at any scale.
  *
  * De-duplication without a `distinct`: a pair sharing k cells would
  * surface k times, so each candidate is kept only in the cell where
  * the overlap STARTS (`cell == floorDiv(greatest(a.s, b.s), W)`) —
  * every overlapping pair is emitted exactly once, and the dedup is a
  * free map-side filter instead of a second shuffle.
  *
  * Cell indices use integer floor-division end-to-end: epoch-nano
  * magnitudes (~1.7e18) exceed a double's 2^53 integer range, so a
  * float formulation would mis-bin; and plain `div` truncates toward
  * zero, which would mis-bin pre-epoch (negative) coordinates.
  */
object Intervals {

  /** Floor division as a SQL fragment: `div` truncates toward zero, which
    * mis-bins NEGATIVE coordinates (-1 div 10 = 0, but cell -1 is meant);
    * subtracting the non-negative `pmod` first makes the quotient exact
    * floor division on the whole long range. Shared across the operator
    * families that bin time axes (here and [[Events]]) so the engine has
    * ONE negative-safe cell-math convention. */
  private[graft] def floorDiv(x: String, w: Long): String =
    s"(($x - pmod($x, ${w}L)) div ${w}L)"

  /** All overlapping pairs of `iv` (columns: id, key, s, e — closed
    * intervals, s <= e) within the same `key`: (key, id_a, id_b) with
    * id_a < id_b, each pair exactly once. `cellWidth` tiles the axis;
    * correctness does not depend on it, only replication factor does. */
  def overlapSelfJoin(iv: DataFrame, cellWidth: Long): DataFrame = {
    require(cellWidth > 0, s"cellWidth must be positive: $cellWidth")
    val cells = iv.withColumn("cell",
      explode(sequence(expr(floorDiv("s", cellWidth)), expr(floorDiv("e", cellWidth)))))
    val a = cells.alias("a")
    val b = cells.alias("b")
    a.join(b,
        col("a.key") === col("b.key") && col("a.cell") === col("b.cell") &&
        col("a.id") < col("b.id") &&
        col("a.s") <= col("b.e") && col("b.s") <= col("a.e") &&
        col("a.cell") === expr(floorDiv("greatest(a.s, b.s)", cellWidth)))
      .select(col("a.key").as("key"), col("a.id").as("id_a"), col("b.id").as("id_b"))
  }

  val queries: Seq[Query] = Seq(
    Query(
      "q49_interval_join",
      "Interval-overlap self-join over per-user 1-hour event windows via grid " +
        "bucketization: intervals replicate into the hour cells they touch, " +
        "candidates form on a (user, cell) EQUI-join (never an inequality " +
        "cross product), and each pair is kept only in the cell where the " +
        "overlap starts — exactly-once without a distinct. Integer `div` " +
        "cell math throughout (epoch nanos exceed double's 2^53). Oracle: " +
        "DuckDB's native inequality join.",
      (s, dir) => {
        val hourNs = 3600L * 1000000000L
        val iv = Tables.events(s, dir).select(
          col("event_id").as("id"), col("user_id").as("key"),
          col("ts").as("s"), (col("ts") + hourNs).as("e"))
        overlapSelfJoin(iv, cellWidth = hourNs)
          .select(col("key").as("user_id"), col("id_a").as("event_a"),
            col("id_b").as("event_b"))
          .orderBy("user_id", "event_a", "event_b")
      },
      Some("""
        WITH e AS (
          SELECT event_id, user_id, epoch_ns(ts) AS s, epoch_ns(ts) + 3600000000000 AS e
          FROM events
        )
        SELECT a.user_id, a.event_id AS event_a, b.event_id AS event_b
        FROM e a JOIN e b
          ON a.user_id = b.user_id AND a.event_id < b.event_id
         AND a.s <= b.e AND b.s <= a.e
        ORDER BY a.user_id, event_a, event_b"""))
  )
}
