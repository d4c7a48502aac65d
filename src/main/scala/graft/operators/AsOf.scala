package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Query
import graft.sources.Tables

/** As-of (point-in-time) join: for every left row, the single right row
  * with the greatest timestamp ≤ the left timestamp, per key — the
  * temporal-join primitive of market-data and feature-store pipelines.
  *
  * Built by composition (preference (a) of the engine's custom-operator
  * policy) rather than a custom `SparkPlan`: tag and union both sides,
  * then one `last(..., ignoreNulls)` running window per key over the
  * merged time order carries the latest right-side values forward onto
  * each left row. Cost: one shuffle on the key (the union sorts within
  * partitions) — the same partitioning a hand-built sort-merge as-of
  * operator would need, with no all-pairs inequality join anywhere
  * (a naive `l.ts >= r.ts` join is a range cross product; this is
  * linear after the sort).
  *
  * Ties: a right row at exactly the left row's timestamp matches
  * (`>=` semantics, sorted right-before-left at equal timestamps);
  * duplicate right rows at the same (key, ts) are deduplicated to the
  * max tiebreak id first, keeping the result deterministic. Left rows
  * with no prior right row are dropped (inner as-of, matching DuckDB's
  * `ASOF JOIN`).
  */
object AsOf {

  /** `left` (key, ts, payload…) as-of joined against `right`
    * (key, ts, payload…); both frames must expose the named key/ts
    * columns; right payload columns are carried onto matching left rows.
    * Right payload column names must not collide with left payload names.
    *
    * The whole right payload travels as ONE nullable struct, so a right
    * row is carried (or not) atomically: a right row with some NULL
    * payload values still matches as itself — per-column carrying would
    * stitch together values from different right rows (an older non-null
    * X with a newer Y), emitting a composite row that never existed. */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String): DataFrame = {
    val rightCols = right.columns.filter(c => c != key && c != ts).toSeq
    val leftCols = left.columns.filter(c => c != key && c != ts).toSeq
    val clash = rightCols.toSet.intersect(leftCols.toSet)
    require(clash.isEmpty,
      s"right payload columns collide with left columns: ${clash.mkString(", ")}")
    // one atomic payload struct per right row; the marker field keeps the
    // struct non-empty (and the match decidable) when the right frame has
    // no payload columns at all
    val payload = struct(lit(1L).as("__present") +: rightCols.map(col): _*)
    val payloadType = right.select(payload).schema.head.dataType
    // merged stream: right rows sort before left rows at equal ts so that
    // an exactly-simultaneous right row is visible to the left row (>=)
    val taggedRight = right.select(
      Seq(col(key), col(ts), lit(0).as("__side"), payload.as("__r")) ++
        leftCols.map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      Seq(col(key), col(ts), lit(1).as("__side"),
        lit(null).cast(payloadType).as("__r")) ++ leftCols.map(col): _*)
    val w = Window.partitionBy(key).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__r").isNotNull)
      .select(Seq(col(key), col(ts)) ++
        rightCols.map(c => col("__r").getField(c).as(c)) ++ leftCols.map(col): _*)
  }

  /** Forward as-of join: each left row picks up the EARLIEST right row
    * at-or-after its timestamp (the "next scheduled event" direction) —
    * implemented by time negation over [[asOfJoin]], so the two
    * directions share one audited code path. The negated column is only
    * an internal sort key; the caller's `ts` values come back intact.
    *
    * NUMERIC `ts` only: the negation trick needs `-ts` to be
    * order-reversing, which holds for numeric columns but does not even
    * analyze for TimestampType (which the backward [[asOfJoin]] itself
    * accepts). Checked eagerly so callers get an actionable error, not a
    * raw analyzer failure; a timestamp caller converts to epoch
    * micros/nanos first (this codebase reads event time as epoch-nano
    * longs throughout — see [[graft.sources.Tables.events]]). */
  def asOfJoinForward(left: DataFrame, right: DataFrame, key: String, ts: String): DataFrame = {
    Seq("left" -> left, "right" -> right).foreach { case (side, df) =>
      val t = df.schema(ts).dataType
      require(t.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"asOfJoinForward needs a numeric $side.$ts to negate (got ${t.simpleString}); " +
          "convert timestamps to epoch numbers first")
    }
    def flip(df: DataFrame) = df.withColumn(ts, -col(ts))
    flip(asOfJoin(flip(left), flip(right), key, ts))
  }

  val queries: Seq[Query] = Seq(
    Query(
      "q26_asof_join",
      "As-of join composed from a tagged union + per-key running last() window " +
        "(one shuffle on the key, no inequality cross product): each event picks " +
        "up its user's most recent checkpoint at-or-before its timestamp. Oracle " +
        "is DuckDB's native ASOF JOIN.",
      (s, dir) => {
        val ev = Tables.events(s, dir).select("user_id", "ts", "event_id")
        // deterministic sparse checkpoint stream: every 20th event, deduped
        // to one row per (user, ts) keeping the max id
        val cp = ev.filter(col("event_id") % 20 === 0)
          .groupBy(col("user_id"), col("ts").as("ts"))
          .agg(max("event_id").as("cp_id"))
          .select(col("user_id"), col("ts"), col("cp_id"))
        // note: raw ts is not in the output — DuckDB reads the parquet
        // TIMESTAMP(NANOS) at microsecond precision while Spark keeps
        // full nanos, so the raw values differ below the microsecond;
        // the match itself is unaffected (events are seconds apart)
        asOfJoin(ev, cp, key = "user_id", ts = "ts")
          .select(col("event_id"), col("user_id"), col("cp_id"))
          .orderBy("event_id")
      },
      Some("""
        WITH ev AS (SELECT user_id, epoch_ns(ts) AS ts, event_id FROM events),
        cp AS (
          SELECT user_id, ts, MAX(event_id) AS cp_id
          FROM ev WHERE event_id % 20 = 0
          GROUP BY user_id, ts)
        SELECT e.event_id, e.user_id, c.cp_id
        FROM ev e ASOF JOIN cp c
          ON e.user_id = c.user_id AND e.ts >= c.ts
        ORDER BY e.event_id"""))
    ,
    Query(
      "q61_asof_forward",
      "FORWARD as-of join — each event picks up its user's next checkpoint " +
        "at-or-after its timestamp (deadline/next-scheduled-event semantics), " +
        "by time negation over the q26 backward join so both directions share " +
        "one audited code path. Oracle: DuckDB native ASOF with the <= " +
        "inequality.",
      (s, dir) => {
        val ev = Tables.events(s, dir).select("user_id", "ts", "event_id")
        val cp = ev.filter(col("event_id") % 20 === 0)
          .groupBy(col("user_id"), col("ts").as("ts"))
          .agg(max("event_id").as("cp_id"))
          .select(col("user_id"), col("ts"), col("cp_id"))
        asOfJoinForward(ev, cp, key = "user_id", ts = "ts")
          .select(col("event_id"), col("user_id"), col("cp_id"))
          .orderBy("event_id")
      },
      Some("""
        WITH ev AS (SELECT user_id, epoch_ns(ts) AS ts, event_id FROM events),
        cp AS (
          SELECT user_id, ts, MAX(event_id) AS cp_id
          FROM ev WHERE event_id % 20 = 0
          GROUP BY user_id, ts)
        SELECT e.event_id, e.user_id, c.cp_id
        FROM ev e ASOF JOIN cp c
          ON e.user_id = c.user_id AND e.ts <= c.ts
        ORDER BY e.event_id"""))
  )
}
