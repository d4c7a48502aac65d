package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.Query
import graft.sources.Tables

/** Event-stream analytics over the semi-structured `events` table:
  * typed JSON extraction, pivoted cohort matrices, and time-series
  * gap-filling — the shapes an events warehouse runs daily.
  *
  * Scale notes per operator are on each catalog entry; the common
  * thread is that every one stays an (at most) one-shuffle aggregate:
  * JSON parsing is per-row map work, the pivot is a single hash
  * aggregate with conditional partials (never one-query-per-column),
  * and gap-filling generates missing rows from per-key SPANS (two
  * small aggregates + an explode), not from a calendar cross join.
  */
object Events {

  // k typed LONG to match the oracle's BIGINT cast exactly: an IntegerType
  // schema would NULL any k outside Int32 range on the Spark side only
  // (PERMISSIVE parse), silently breaking bit-for-bit oracle parity
  private val propsSchema = StructType(Seq(StructField("k", LongType)))

  /** Per-day index of an epoch-nano timestamp — [[Intervals.floorDiv]]
    * integer floor math, negative-safe for pre-epoch timestamps (plain
    * `div` truncates toward zero and would mis-bin day -1 as day 0;
    * epoch nanos also exceed double's 2^53, so no float formulation). */
  private def dayOf(c: String): org.apache.spark.sql.Column =
    expr(Intervals.floorDiv(c, 86400000000000L))

  /** (user_id, day, n_events) for EVERY day in each user's active span,
    * gap days included with n_events = 0.
    *
    * Shape (round-6 restructure — was a persisted per-(user, day) frame
    * self-joined against its own exploded spans): two chained
    * aggregates, no join, no persist. The (user, day) counts collapse
    * map-side; a second user-keyed aggregate collects each user's
    * active days into an in-row map plus the span bounds, and the gap
    * fill is a per-row `sequence`/`transform` lookup — the join the old
    * form shuffled both sides for becomes an `element_at` against the
    * row's own map. Per-user in-row state is bounded by the user's span
    * in DAYS (an epoch-to-now span is ~20k entries), so the collected
    * map cannot blow up a row at any corpus scale; the exploded output
    * is identical row-for-row to the join form. */
  def gapFilledDailyCounts(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), dayOf("ts").as("day"))
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n_events"))
      .groupBy("user_id")
      .agg(map_from_entries(collect_list(struct(col("day"), col("n_events"))))
          .as("m"),
        min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"),
        explode(transform(sequence(col("d0"), col("d1")), d =>
          struct(d.as("day"),
            coalesce(element_at(col("m"), d), lit(0L)).as("n_events")))).as("e"))
      .select(col("user_id"), col("e.day").as("day"), col("e.n_events").as("n_events"))

  /** Integer-exact rolling spike detection over per-entity daily
    * activity — the telemetry/abuse-monitoring shape (flag a day whose
    * volume jumps a factor above the entity's trailing baseline).
    *
    * Semantics: day = floor(ts / 86400e9) (the engine-wide negative-
    * safe cell math, [[Intervals.floorDiv]]); the baseline is the up-to
    * `window` OBSERVED preceding days (a rows-frame — sparse calendars
    * don't fabricate zero days); a spike needs ≥3 baseline days and
    * n · base_n > factor · base_sum — the mean comparison cleared of
    * division, so every column and the flag itself stay INTEGER-exact
    * cross-engine (the q96/q71 rule applied to time series; a z-score
    * variant would put doubles and sqrt in the oracle path).
    *
    * Scale shape: the corpus-sized pass is the daily pre-aggregate
    * (map-side-combining count to user×day cardinality); the window
    * then runs per-ENTITY over the compacted frame with a bounded
    * rows-frame — never over raw events, never unpartitioned. */
  def spikeDetect(events: DataFrame, window: Int, factor: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events.select(col("user_id"),
        expr(Intervals.floorDiv("ts", 86400L * 1000000000L)).as("day"))
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(-window, -1)
    daily
      .withColumn("base_n", count(lit(1)).over(w))
      .withColumn("base_sum", coalesce(sum("n_events").over(w), lit(0L)))
      .withColumn("is_spike", col("base_n") >= 3 &&
        col("n_events") * col("base_n") > lit(factor) * col("base_sum"))
  }

  val queries: Seq[Query] = Seq(
    Query(
      "q54_json_extract",
      "Typed JSON extraction from the events.props column (from_json with an " +
        "explicit schema — parsed once per row into a typed struct, no " +
        "per-field re-parse) feeding one event-type-keyed aggregate. " +
        "Map-only until the 5-group exchange; integer-exact stats, so the " +
        "DuckDB json_extract oracle matches bit-for-bit.",
      (s, dir) =>
        Tables.events(s, dir)
          .select(col("event_type"),
            from_json(col("props"), propsSchema).getField("k").as("k"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
            min("k").as("min_k"), max("k").as("max_k"))
          .orderBy("event_type"),
      Some("""
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(MIN(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS min_k,
               CAST(MAX(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    Query(
      "q55_pivot",
      "Pivoted cohort matrix: event counts per (user_id % 10 cohort) x " +
        "event_type, with the pivot column set passed EXPLICITLY — Spark " +
        "then plans ONE hash aggregate with five conditional partials (the " +
        "implicit form runs a distinct-values job first; a per-column " +
        "subquery would be five scans). Missing combinations coalesce to 0 " +
        "to match the conditional-count oracle.",
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val p = Tables.events(s, dir)
          .groupBy((col("user_id") % 10).as("cohort"))
          .pivot("event_type", types)
          .agg(count(lit(1)))
        p.select(col("cohort") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
          .orderBy("cohort")
      },
      Some("""
        SELECT user_id % 10 AS cohort,
               COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
               COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
               COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
               COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
        FROM events
        GROUP BY 1
        ORDER BY cohort""")),

    Query(
      "q56_gapfill",
      "Time-series gap-fill: per-(user, day) event counts for EVERY day in " +
        "each user's active span, zeros included — generated from per-user " +
        "span aggregates (min/max day + sequence explode), never a calendar " +
        "cross join, so the generated row count is bounded by actual spans. " +
        "Day indices are integer floor divisions of epoch nanos (2^53-safe). " +
        "Two chained aggregates, no join: each user's active-day counts " +
        "collect into an in-row map (bounded by span days) and gap days " +
        "fill via a per-row sequence/element_at lookup.",
      (s, dir) =>
        gapFilledDailyCounts(Tables.events(s, dir))
          .orderBy("user_id", "day"),
      Some("""
        WITH by_day AS (
          SELECT user_id, epoch_ns(ts) // 86400000000000 AS day, COUNT(*) AS n_events
          FROM events GROUP BY 1, 2
        ), spans AS (
          SELECT user_id, unnest(generate_series(MIN(day), MAX(day))) AS day
          FROM by_day GROUP BY user_id
        )
        SELECT s.user_id, s.day, CAST(COALESCE(b.n_events, 0) AS BIGINT) AS n_events
        FROM spans s LEFT JOIN by_day b USING (user_id, day)
        ORDER BY user_id, day"""))
    ,
    Query(
      "q57_funnel",
      "Ordered conversion funnel view -> click -> purchase: per-user minimum " +
        "timestamp of each stage STRICTLY AFTER the previous stage's " +
        "completion (three stage-filtered min aggregates chained by user-" +
        "keyed equi-joins — never a per-user event-sequence sort). Emits " +
        "users-per-stage; integer-nano timestamps end to end.",
      (s, dir) => {
        val ev = Tables.events(s, dir).select("user_id", "event_type", "ts")
        // each stage frame feeds BOTH the next stage's join and its own
        // count branch; eager persists (tiny per-user frames) pin the
        // events scans at one per stage instead of re-deriving the whole
        // prefix of the funnel under every union branch. Cache contract
        // as in Dedup.jaccardJoin: the returned union reads v/c
        // lazily, so they stay persisted until the batch driver's
        // clearCache() between queries (Bench and Verify both do)
        val v = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("t1")).persist()
        v.count()
        val c = ev.filter(col("event_type") === "click")
          .join(v, Seq("user_id")).filter(col("ts") > col("t1"))
          .groupBy("user_id").agg(min("ts").as("t2")).persist()
        c.count()
        val p = ev.filter(col("event_type") === "purchase")
          .join(c, Seq("user_id")).filter(col("ts") > col("t2"))
          .groupBy("user_id").agg(min("ts").as("t3"))
        val stages = Seq(("1_view", v), ("2_click_after_view", c),
          ("3_purchase_after_click", p))
        stages.map { case (name, df) =>
          df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
        }.reduce(_ union _).orderBy("stage")
      },
      Some("""
        WITH v AS (
          SELECT user_id, MIN(epoch_ns(ts)) AS t1 FROM events
          WHERE event_type = 'view' GROUP BY 1
        ), c AS (
          SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t2
          FROM events e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND epoch_ns(e.ts) > v.t1
          GROUP BY 1
        ), p AS (
          SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t3
          FROM events e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > c.t2
          GROUP BY 1
        )
        SELECT stage, n_users FROM (
          SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
          UNION ALL
          SELECT '2_click_after_view', COUNT(*) FROM c
          UNION ALL
          SELECT '3_purchase_after_click', COUNT(*) FROM p)
        ORDER BY stage""")),

    Query(
      "q58_retention",
      "Weekly cohort retention: users grouped by the week of their FIRST " +
        "event; for each (cohort week, week offset) count the distinct " +
        "users active that week. Two aggregates — first-touch per user, " +
        "distinct (user, week) activity — and one user-keyed equi-join; " +
        "week indices are integer floor divisions of epoch nanos.",
      (s, dir) => {
        val weekNs = 7L * 86400000000000L
        val ev = Tables.events(s, dir)
          .select(col("user_id"), expr(Intervals.floorDiv("ts", weekNs)).as("week"))
        val firstTouch = ev.groupBy("user_id").agg(min("week").as("cohort"))
        val active = ev.distinct()
        active.join(firstTouch, Seq("user_id"))
          .groupBy(col("cohort"), (col("week") - col("cohort")).as("week_offset"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy("cohort", "week_offset")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, epoch_ns(ts) // 604800000000000 AS week FROM events
        ), first_touch AS (
          SELECT user_id, MIN(week) AS cohort FROM ev GROUP BY 1
        ), active AS (
          SELECT DISTINCT user_id, week FROM ev
        )
        SELECT f.cohort, a.week - f.cohort AS week_offset, COUNT(*) AS n_users
        FROM active a JOIN first_touch f USING (user_id)
        GROUP BY 1, 2
        ORDER BY cohort, week_offset"""))
    ,
    Query(
      "q117_spike_detect",
      "Rolling spike detection over per-user daily event volume: a day " +
        "is a spike when its count exceeds 3x the mean of the trailing " +
        "(up to 7 observed) days with >=3 days of history — the " +
        "telemetry/abuse-monitoring shape. The mean test rides as " +
        "n*base_n > 3*base_sum, so every column AND the flag are " +
        "integer-exact cross-engine. Corpus pass = one map-side-" +
        "combining daily count; the bounded rows-frame window runs " +
        "per-entity over the compacted user x day frame only.",
      (s, dir) =>
        spikeDetect(Tables.events(s, dir), window = 7, factor = 3)
          .orderBy("user_id", "day"),
      Some("""
        WITH daily AS (
          SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
                 COUNT(*) AS n_events
          FROM events GROUP BY 1, 2
        ), r AS (
          SELECT user_id, day, n_events,
                 COUNT(*) OVER w AS base_n,
                 CAST(COALESCE(SUM(n_events) OVER w, 0) AS BIGINT) AS base_sum
          FROM daily
          WINDOW w AS (PARTITION BY user_id ORDER BY day
                       ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
        )
        SELECT user_id, day, n_events, base_n, base_sum,
               (base_n >= 3 AND n_events * base_n > 3 * base_sum) AS is_spike
        FROM r ORDER BY user_id, day"""))
  )
}
