package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Query
import graft.sources.Tables

/** Corpus snapshot diff — the incremental-ingest accounting step: given
  * yesterday's and today's crawls, classify every document as added,
  * removed, changed, or unchanged, WITHOUT ever comparing bodies across
  * the shuffle.
  *
  * Shape: each side reduces to (doc_id, sha256(text)) in a map-side
  * projection — 40 bytes per doc — then ONE doc_id-keyed full-outer
  * equi-join and a 4-group count. At 100 TB the exchange carries
  * digests, never text; the join is the only shuffle and it is exactly
  * as wide as the doc-id space. The same digest-join shape backs exact
  * dedup (q16); this is its two-snapshot generalization.
  */
object SnapshotDiff {

  /** Per-status document counts between two (doc_id, text) snapshots.
    *
    * `doc_id` must be unique within each snapshot (the usual crawl-key
    * contract); duplicate ids would fan out in the full-outer join and
    * inflate every status bucket — dedup upstream (q16) first.
    *
    * Row PRESENCE travels as an explicit flag, not as digest nullity: a
    * document whose text is NULL still exists, and keying the CASE on
    * `sha2(NULL) IS NULL` would misclassify it as absent (a NULL-text
    * doc present only in `before` would count "added" instead of
    * "removed"). NULL texts compare via null-safe equality: two NULL
    * texts are "unchanged", NULL vs non-NULL is "changed". */
  def diffCounts(before: DataFrame, after: DataFrame): DataFrame = {
    def digests(df: DataFrame, name: String, flag: String): DataFrame =
      df.select(col("doc_id"), sha2(col("text"), 256).as(name),
        lit(true).as(flag))
    val status: Column =
      when(col("in_before").isNull, "added")
        .when(col("in_after").isNull, "removed")
        .when(col("d_before") <=> col("d_after"), "unchanged")
        .otherwise("changed")
    digests(before, "d_before", "in_before")
      .join(digests(after, "d_after", "in_after"), Seq("doc_id"), "full_outer")
      .groupBy(status.as("status"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** CDC log compaction — collapse an append-only change log to the
    * latest record per key: the "current state" materialization every
    * incremental pipeline runs over its upsert stream before joining it
    * with anything else. Versions are ordered by (ts, tiebreak); the
    * tiebreak column must make the ordering total (a unique event id),
    * or "latest" would be nondeterministic under equal timestamps.
    *
    * Shape: ONE `max_by(struct(payload...), struct(ts, tiebreak))`
    * aggregate — a map-side-combining reduction that keeps a single
    * struct per key per partition, so the shuffle carries one row per
    * DISTINCT key per map task regardless of how many versions the log
    * holds. The window formulation (`row_number() over (partition by
    * key order by ts desc) = 1` — what the SQL oracle runs) would
    * instead shuffle EVERY version and sort each key's history in one
    * task: the q31 single-task pathology, fatal on a 100 TB log where
    * hot keys hold millions of versions. */
  def latestByKey(log: DataFrame, key: Seq[String], ts: String,
      tiebreak: String, payload: Seq[String]): DataFrame = {
    val ord = struct(col(ts), col(tiebreak))
    val out = (ts +: tiebreak +: payload).distinct
    log.groupBy(key.map(col): _*)
      .agg(max_by(struct(out.map(col): _*), ord).as("last"),
        count(lit(1)).as("n_versions"))
      .select(key.map(col) ++
        out.map(c => col(s"last.$c").as(s"last_$c")) :+
        col("n_versions"): _*)
  }

  /** Signed aggregate state for incremental view maintenance: one row
    * per group with `n_rows` and each measure summed under the CDC sign
    * (+1 for inserts, -1 for deletes; an update is its delete+insert
    * pair, which the sign algebra cancels exactly). Measures must
    * already be decimal-cast (the Query numeric-parity contract) so
    * partial-aggregation order cannot perturb low-order bits — signed
    * sums are only mergeable when they are exact.
    *
    * This is the classic delta-maintenance shape for distributive
    * aggregates (count/sum; avg derives as sum/count): state and deltas
    * live in the same algebra, so refresh is state-plus-delta, never a
    * base-table rescan. */
  def signedState(rows: DataFrame, op: Column, keys: Seq[String],
      measures: Seq[(String, Column)]): DataFrame = {
    val sign = when(op === "D", lit(-1L)).otherwise(lit(1L))
    val aggs = sum(sign).as("n_rows") +:
      measures.map { case (n, c) => sum(sign * c).as(n) }
    rows.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Incremental materialized-aggregate refresh: merge a stored
    * aggregate state with a CDC delta batch's [[signedState]] —
    * group-keyed union + re-sum, then drop groups whose row count
    * reached zero (every member deleted), the same empty-group
    * elimination the reference's hash aggregate applies
    * (reference `ETL.java:265` emits only populated cells).
    *
    * Scale shape: work is O(|delta| + |state|). The delta aggregate is
    * the only data-sized pass and it map-side-combines down to
    * group-cardinality partials; the merge shuffles two
    * group-cardinality frames. The base FACT table is never read — at
    * 100 TB that is the difference between a delta-sized job and a
    * full recompute. A consistent CDC stream (deletes reference rows
    * actually present) can never drive `n_rows` negative; the `> 0`
    * filter therefore equals `=!= 0` and also heals the benign case of
    * a group born and fully deleted within one batch. */
  def refreshAgg(state: DataFrame, delta: DataFrame, op: Column,
      keys: Seq[String], measures: Seq[(String, Column)]): DataFrame = {
    val names = "n_rows" +: measures.map(_._1)
    val aggs = names.map(n => sum(col(n)).as(n))
    state.select(keys.map(col) ++ names.map(col): _*)
      .unionByName(signedState(delta, op, keys, measures)
        .select(keys.map(col) ++ names.map(col): _*))
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("n_rows") > 0)
  }

  /** MERGE INTO — the warehouse upsert primitive (ISO SQL MERGE, the
    * Delta/Iceberg `MERGE INTO` shape): apply a keyed change batch to a
    * target table in ONE pass. Semantics: matched + op='D' deletes the
    * target row; matched + op='U' replaces its payload; unmatched +
    * op∈{'I','U'} inserts (the usual upsert liberality: an update for
    * a row that does not exist yet inserts it); unmatched target rows
    * pass through untouched; unmatched + op='D' is a no-op.
    *
    * Contract (the diffCounts/q68 convention): `source` holds one row
    * per key — pre-compact a multi-row batch with [[latestByKey]];
    * duplicate source keys would fan the full-outer join out and
    * duplicate target rows. Presence travels as explicit side markers,
    * never as payload nullity (a NULL payload value is still a row —
    * the [[diffCounts]] lesson).
    *
    * Shape: ONE key-equi full-outer join (target ⋈ batch) + a map-side
    * CASE projection — work is |target| + |batch| with the join as the
    * only exchange; the batch side broadcasts when small. This is the
    * row-level companion of [[refreshAgg]]'s aggregate-state merge:
    * refreshAgg maintains derived aggregates delta-wise, mergeInto
    * maintains the base table itself. At 100 TB the production form
    * partitions both sides by key and rewrites only matched partitions
    * (the Delta/Iceberg file-pruning layer — out of scope here); the
    * JOIN SHAPE is identical. */
  def mergeInto(target: DataFrame, source: DataFrame, key: String,
      payload: Seq[String]): DataFrame = {
    val tm = target.select(col(key) +: payload.map(col) :+
      lit(true).as("__in_t"): _*)
    val sm = source.select(col(key) +: col("__op") +:
      payload.map(c => col(c).as(s"__s_$c")) :+ lit(true).as("__in_s"): _*)
    tm.join(sm, Seq(key), "full_outer")
      .filter(
        // deletes drop matched rows; unmatched deletes are no-ops
        !(coalesce(col("__in_s"), lit(false)) && col("__op") === "D"))
      .filter(coalesce(col("__in_t"), lit(false)) ||
        col("__op").isin("I", "U"))
      .select(col(key) +: payload.map(c =>
        when(coalesce(col("__in_s"), lit(false)) && col("__op") =!= "D",
          col(s"__s_$c")).otherwise(col(c)).as(c)): _*)
  }

  /** Type-2 slowly-changing dimension from a change log: per entity
    * (`key`), ordered by (`ts`, `tiebreak`), consecutive runs of the
    * same `state` collapse into one version row carrying its validity
    * interval — (key, version, state, valid_from, valid_to,
    * is_current), with `valid_to` null on the open current version.
    * The warehouse-standard dimension-history build (Kimball SCD-2).
    *
    * Shape: two window passes over the SAME (key)-partitioned
    * (ts, tiebreak) order — `lag` marks change points, then
    * `lead`/`row_number` over the surviving change rows close the
    * intervals — so Catalyst plans ONE exchange; the second Window
    * reuses the first's partitioning (the filter preserves it) and
    * only re-sorts within partitions. No global (unpartitioned) window
    * anywhere. Scale contract: windows are per-ENTITY — a dimension
    * key's version history (thousands of rows) must fit a partition,
    * which is the SCD premise itself; the fact-sized table never meets
    * a window in this operator. Ties on `ts` are settled by the
    * `tiebreak` total order, so version boundaries are deterministic
    * and engine-independent. */
  def scd2(log: DataFrame, key: String, ts: String, tiebreak: String,
      state: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(key).orderBy(ts, tiebreak)
    val changes = log
      .withColumn("__prev", lag(col(state), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(state))
    changes.select(
        col(key),
        row_number().over(w).cast("int").as("version"),
        col(state).as("state"),
        col(ts).as("valid_from"),
        lead(col(ts), 1).over(w).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
  }

  val queries: Seq[Query] = Seq(
    Query(
      "q59_snapshot_diff",
      "Corpus snapshot diff: docs present only before -> removed, only " +
        "after -> added, digest mismatch -> changed. Snapshots are carved " +
        "deterministically from the documents table (before drops doc_id%7=0, " +
        "after drops doc_id%5=0 and rewrites doc_id%11=0 bodies), so every " +
        "status bucket is exercised. Map-side SHA-256 projections reduce " +
        "each side to 40-byte digest rows before the single full-outer " +
        "equi-join — bodies never cross the exchange.",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val before = docs.filter(col("doc_id") % 7 =!= 0)
        val after = docs.filter(col("doc_id") % 5 =!= 0)
          .select(col("doc_id"),
            when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2")))
              .otherwise(col("text")).as("text"))
        diffCounts(before, after).orderBy("status")
      },
      Some("""
        WITH before_s AS (
          SELECT doc_id, sha256(text) AS d_before, TRUE AS in_before
          FROM documents WHERE doc_id % 7 <> 0
        ), after_s AS (
          SELECT doc_id,
                 sha256(CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END) AS d_after,
                 TRUE AS in_after
          FROM documents WHERE doc_id % 5 <> 0
        )
        SELECT CASE WHEN in_before IS NULL THEN 'added'
                    WHEN in_after IS NULL THEN 'removed'
                    WHEN d_before IS NOT DISTINCT FROM d_after THEN 'unchanged'
                    ELSE 'changed' END AS status,
               COUNT(*) AS n_docs
        FROM before_s FULL OUTER JOIN after_s USING (doc_id)
        GROUP BY 1
        ORDER BY status"""))
    ,
    Query(
      "q68_cdc_latest",
      "CDC log compaction to current state: latest event per user by " +
        "(ts, event_id), via ONE map-side-combining max_by(struct) " +
        "aggregate — the shuffle carries one candidate row per distinct " +
        "key per map task, NOT the full version history. The oracle runs " +
        "the textbook row_number()-window formulation — the very shape " +
        "the operator avoids (it would single-task-sort each hot key's " +
        "millions of versions at 100 TB) — proving the reduction computes " +
        "identical 'latest' semantics, deterministic under the " +
        "(ts, event_id) total order.",
      (s, dir) =>
        // the log's nano ts is truncated to MICROS for the catalog entry
        // only, because the DuckDB oracle reads the nanos parquet at µs
        // precision — both engines must order versions over the SAME
        // timestamp domain or a same-µs pair could elect different
        // winners (the event_id tiebreak then settles same-µs pairs
        // identically on both sides); floorDiv is the negative-safe
        // shared cell-math convention (Intervals)
        latestByKey(
          Tables.events(s, dir).withColumn("ts",
            expr(graft.operators.Intervals.floorDiv("ts", 1000L))),
          key = Seq("user_id"), ts = "ts", tiebreak = "event_id",
          payload = Seq("event_type", "value"))
          .orderBy("user_id"),
      Some("""
        SELECT user_id,
               epoch_us(ts) AS last_ts,
               event_id AS last_event_id,
               event_type AS last_event_type,
               value AS last_value,
               n_versions
        FROM (
          SELECT *,
                 COUNT(*) OVER (PARTITION BY user_id) AS n_versions,
                 -- order on the MICROSECOND domain explicitly (epoch_us),
                 -- matching the Spark side's truncation: on a DuckDB with
                 -- native TIMESTAMP_NS (>= 1.1) raw-ts ordering could
                 -- elect a different winner for a same-microsecond pair
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
          FROM events
        )
        WHERE rn = 1
        ORDER BY user_id"""))
    ,
    Query(
      "q82_incr_refresh",
      "Incremental materialized-aggregate refresh: a stored per-(flag, " +
        "status) aggregate of the base lineitem fact is brought current " +
        "with one CDC batch (inserts = l_orderkey%10=0, deletes = " +
        "l_orderkey%7=0 of the base) via signed delta-state merge — " +
        "work is delta-sized + group-cardinality-sized, the base fact " +
        "is never rescanned for the refresh itself. Sums ride " +
        "DECIMAL(18,2) so signed partials merge exactly; the oracle " +
        "recomputes the post-batch aggregate from scratch, proving " +
        "state + delta == full recompute.",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val keys = Seq("l_returnflag", "l_linestatus")
        val measures = Seq(
          "sum_qty" -> col("l_quantity").cast("decimal(18,2)"),
          "sum_price" -> col("l_extendedprice").cast("decimal(18,2)"))
        val base = li.filter(col("l_orderkey") % 10 =!= 0)
        // in production `state` is the STORED table; the catalog entry
        // derives it from the same fixtures so the oracle can re-derive
        // the whole history in one engine
        val state = signedState(base, lit("I"), keys, measures)
        val delta = li.filter(col("l_orderkey") % 10 === 0)
          .withColumn("__op", lit("I"))
          .unionByName(base.filter(col("l_orderkey") % 7 === 0)
            .withColumn("__op", lit("D")))
        refreshAgg(state, delta, col("__op"), keys, measures)
          .select(col("l_returnflag"), col("l_linestatus"), col("n_rows"),
            col("sum_qty").cast("double").as("sum_qty"),
            col("sum_price").cast("double").as("sum_price"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""
        WITH eff AS (
          SELECT * FROM lineitem
          WHERE l_orderkey % 10 <> 0 AND l_orderkey % 7 <> 0
          UNION ALL
          SELECT * FROM lineitem WHERE l_orderkey % 10 = 0
        )
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM eff
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""))
    ,
    Query(
      "q112_scd2",
      "Type-2 slowly-changing dimension build (Kimball SCD-2) from the " +
        "event change log: per user, consecutive runs of the same " +
        "event_type collapse to one version row with its validity " +
        "interval [valid_from, valid_to) and an is_current flag on the " +
        "open version. Per-entity windows only (one exchange, no global " +
        "window); (ts, event_id) total order makes version boundaries " +
        "deterministic. Timestamps ride the microsecond domain on both " +
        "engines (the q68 convention).",
      (s, dir) =>
        scd2(
          Tables.events(s, dir).withColumn("ts",
            expr(graft.operators.Intervals.floorDiv("ts", 1000L))),
          key = "user_id", ts = "ts", tiebreak = "event_id",
          state = "event_type")
          .orderBy("user_id", "version"),
      Some("""
        WITH o AS (
          SELECT user_id, event_id, epoch_us(ts) AS ts, event_type,
                 lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY epoch_us(ts), event_id) AS prev
          FROM events
        ), c AS (
          SELECT user_id, event_id, ts, event_type
          FROM o WHERE prev IS NULL OR prev <> event_type
        )
        SELECT user_id,
               CAST(row_number() OVER w AS INT) AS version,
               event_type AS state,
               ts AS valid_from,
               lead(ts) OVER w AS valid_to,
               lead(ts) OVER w IS NULL AS is_current
        FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, version"""))
    ,
    Query(
      "q118_merge_upsert",
      "MERGE INTO (the Delta/Iceberg warehouse upsert): one keyed change " +
        "batch — deletes (custkey%7=0), payload updates (%5=0), inserts " +
        "(supplier-derived new keys) — applied to the customer dimension " +
        "in ONE full-outer key join + a map-side CASE projection; work " +
        "is |target|+|batch|, the join is the only exchange, presence " +
        "rides explicit side markers (never payload nullity). The " +
        "row-level companion of q82's aggregate-state refresh.",
      (s, dir) => {
        val cust = Tables.customer(s, dir)
          .select("c_custkey", "c_name", "c_acctbal")
        val del = cust.filter(col("c_custkey") % 7 === 0)
          .select(col("c_custkey"), lit("D").as("__op"),
            lit(null).cast("string").as("c_name"),
            lit(null).cast("double").as("c_acctbal"))
        val upd = cust.filter(col("c_custkey") % 7 =!= 0 &&
            col("c_custkey") % 5 === 0)
          .select(col("c_custkey"), lit("U").as("__op"),
            concat(col("c_name"), lit("*")).as("c_name"),
            (col("c_acctbal") + 100.0).as("c_acctbal"))
        val ins = Tables.supplier(s, dir)
          .select((lit(1000000L) + col("s_suppkey")).as("c_custkey"),
            lit("I").as("__op"), col("s_name").as("c_name"),
            col("s_acctbal").as("c_acctbal"))
        mergeInto(cust, del.unionByName(upd).unionByName(ins),
          "c_custkey", Seq("c_name", "c_acctbal"))
          .orderBy("c_custkey")
      },
      Some("""
        WITH batch AS (
          SELECT c_custkey AS k, 'D' AS op,
                 CAST(NULL AS VARCHAR) AS name, CAST(NULL AS DOUBLE) AS bal
          FROM customer WHERE c_custkey % 7 = 0
          UNION ALL
          SELECT c_custkey, 'U', c_name || '*', c_acctbal + 100.0
          FROM customer WHERE c_custkey % 7 <> 0 AND c_custkey % 5 = 0
          UNION ALL
          SELECT 1000000 + s_suppkey, 'I', s_name, s_acctbal
          FROM supplier
        )
        SELECT COALESCE(t.c_custkey, b.k) AS c_custkey,
               CASE WHEN b.op IS NOT NULL AND b.op <> 'D' THEN b.name
                    ELSE t.c_name END AS c_name,
               CASE WHEN b.op IS NOT NULL AND b.op <> 'D' THEN b.bal
                    ELSE t.c_acctbal END AS c_acctbal
        FROM customer t FULL OUTER JOIN batch b ON t.c_custkey = b.k
        WHERE (b.op IS NULL OR b.op <> 'D')
          AND (t.c_custkey IS NOT NULL OR b.op IN ('I', 'U'))
        ORDER BY c_custkey"""))
  )
}
