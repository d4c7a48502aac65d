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

  /** Robust per-group outlier accounting via median/MAD — the
    * data-cleaning pass that survives the outliers it is hunting (mean/
    * stddev z-scores are dragged by the very tail they should flag; the
    * median and the median absolute deviation have a 50% breakdown
    * point). Input follows the [[Relational.exactPercentiles]] contract:
    * a frame with the group column and the measure as `x`.
    *
    * Two exact-median rounds, each the scale-safe bucketed two-pass rank
    * (q31) — no per-group single-task window anywhere: (1) per-group
    * median of `x`; (2) per-group median of `|x - med|`, computed after a
    * BROADCAST of the tiny per-group median frame (G rows); then one
    * final map-side-combining aggregate counts rows with
    * `|x - med| > k * MAD`. Four corpus scans total, each reducing
    * map-side; all joins broadcast. The flag arithmetic (abs/sub/mul/
    * compare on doubles) is IEEE-identical in Spark and DuckDB, and the
    * median interpolation bit-matches quantile_cont, so the oracle checks
    * the exact outlier COUNT, not a tolerance band. */
  def robustOutliers(base0: DataFrame, grp: String, k: Double): DataFrame = {
    val base = base0.filter(col("x").isNotNull)
    // each round's G-row stat frame is referenced by SEVERAL subplans of
    // the next round (its stats aggregate, its bucketing, its straddling-
    // bucket value counts); eagerly collapsing it to a LocalRelation
    // (Relational.localize — bounded G rows) guarantees one execution
    // per round with no cache pinned and no lazy-persist materialization
    // race (the round-17 persist+count form measured 60 s under the
    // driver bench vs 4.6 s before it). The second round's plan then
    // starts from literal medians, not the first round's whole tree.
    val med = Relational.localize(
      Relational.exactPercentiles(base, grp, Seq(0.5 -> "med"))
        .select(col(grp), col("med")))
    val dev = base.join(broadcast(med), Seq(grp))
      .select(col(grp), abs(col("x") - col("med")).as("x"))
    val mad = Relational.localize(
      Relational.exactPercentiles(dev, grp, Seq(0.5 -> "mad"))
        .select(col(grp), col("mad")))
    base.join(broadcast(med.join(mad, Seq(grp))), Seq(grp))
      .groupBy(grp)
      .agg(
        // med/mad are group-constant carried columns; max() re-exposes them
        max("med").as("med"), max("mad").as("mad"),
        count(when(abs(col("x") - col("med")) > lit(k) * col("mad"),
          lit(1))).as("n_outliers"),
        count(lit(1)).as("n"))
  }

  /** Histogram drift between two cohorts of the same measure — the
    * distribution-monitoring pass that catches a silent upstream change
    * (a source re-crawl, a schema default, a unit flip) before it
    * poisons training data: per group, the scaled L1 distance between
    * the cohorts' equi-width histograms over SHARED global bounds.
    *
    * The metric is `Σ_bins |nA·TB − nB·TA|` (TA/TB the group's cohort
    * totals) — the L1 share distance scaled by TA·TB, kept in INTEGER
    * arithmetic end to end. Deliberately not shares: a double
    * Σ|nA/TA − nB/TB| varies in low-order bits with Spark's aggregation
    * order AND ties-rounds differently across engines if forced through
    * decimal; the integer form is exact, deterministic, order-free, and
    * monotone-equivalent for thresholding. Zero iff the cohorts'
    * histograms are proportionally identical.
    *
    * Shape: one-row global bounds broadcast (the q46 two-pass pattern),
    * one map-side-combining (group, cohort, bin) count, two tiny
    * aggregates over the ≤ G·2·B count rows. The corpus is scanned
    * once and never shuffled — only counts cross an exchange. */
  def histogramDrift(df: DataFrame, group: Column, cohort: Column,
      x: Column, nBins: Int): DataFrame = {
    require(nBins > 0, s"nBins must be positive: $nBins")
    val bounds = df.agg(min(x).as("__lo"), max(x).as("__hi"))
    val width = (col("__hi") - col("__lo")) / nBins
    val bin = when(col("__hi") === col("__lo"), 0)
      .otherwise(least(floor((x - col("__lo")) / width).cast("int"), lit(nBins - 1)))
    val counts = df.crossJoin(broadcast(bounds))
      .groupBy(group.as("g"), bin.as("bin"))
      .agg(count(when(cohort === 0, 1)).as("na"),
        count(when(cohort === 1, 1)).as("nb"))
    val totals = counts.groupBy("g")
      .agg(sum("na").as("ta"), sum("nb").as("tb"))
    counts.join(totals, Seq("g"))
      .groupBy("g")
      .agg(sum(abs(col("na") * col("tb") - col("nb") * col("ta"))).as("drift_scaled"),
        max("ta").as("n_a"), max("tb").as("n_b"))
  }

  /** One-scan, all-columns data-card profile: (col_name, n_rows,
    * n_null, n_distinct, min_v, max_v, sum_v) — the summary table a
    * corpus drop publishes before any job trusts it. `numeric` columns
    * get min/max/sum (sum in DECIMAL(18,2), the catalog's exactness
    * contract); `other` columns are counted only (their min/max/sum are
    * NULL — string collation and timestamp rendering are not
    * engine-portable, counts are).
    *
    * Scale shape: the naive formulation is either m separate
    * `SELECT COUNT(DISTINCT c) FROM t` scans or ONE aggregate with m
    * distinct aggregates — which Catalyst plans as an Expand that
    * shuffles m copies of every raw row. This instead unpivots map-side
    * (explode of an m-struct array — m× rows inside the task, never on
    * the wire) and aggregates twice: stage 1 groups by (col, value), so
    * map-side combine caps the exchange at Σ_c distinct(c) partial rows
    * carrying (count, min, max, sum); stage 2 folds the value groups to
    * one row per column — n_null is the null value-group's count,
    * n_distinct is the number of non-null value groups (the exact
    * multi-column distinct, FD-shared like the hypercube's rewrite).
    * Distinct values are keyed by a fixed-width 128-bit DIGEST — two
    * independently-composed xxhash64 lanes over the NATIVE value
    * (round-16; the r15 form was MD5 over the value's string image,
    * and the same-day A/B in BENCH_NOTES.md measured it ~30% of the
    * q83 wall at sf0.1: MD5's rounds plus the per-value string render
    * on every numeric cell). Native hashing keys the same value
    * groups (a column's type is fixed, and the hash input is the
    * value's binary form), the digest is 12 bytes on the wire
    * regardless of value width — a data card over a documents table
    * must never ship full text bodies through the shuffle — and both
    * lanes are codegen'd single-pass kernels. Raw values only ever
    * feed min/max/sum, which exist for NUMERIC columns alone
    * (doubles/decimals — fixed width). The lanes are two structurally
    * different hash FAMILIES — xxhash64 and Murmur3 (r16 advice: a
    * second xxhash64 under a derived seed shares the family's
    * seed-independent collision structures) — 96 independent bits:
    * two-lane collisions undercount n_distinct at ~2^-96 per pair,
    * ~6e-6 expected collisions at 10¹² values, where one 64-bit lane
    * alone would NOT be safe at 100 TB (10¹² values ⇒ ~10⁴ expected
    * birthday collisions; the pair keeps the repo's established
    * cross-engine-hash argument, q39/q161).
    *
    * The per-value min/max/sum partials in stage 1 are exact (min/max
    * trivially; sum is a decimal times an integer count via repeated
    * addition), so the two-stage fold equals the direct aggregate. */
  def profileColumns(df: DataFrame, numeric: Seq[String],
      other: Seq[String]): DataFrame = {
    // null digest ⇔ null value (hash functions SKIP null inputs — they
    // would return the seed, not NULL — so the null branch is explicit).
    // The two lanes are STRUCTURALLY DIFFERENT hash families (round-17,
    // r16 advice): xxhash64 + Murmur3 — the former second lane was
    // xxhash64 with a constant prefix absorbed, i.e. the same family
    // under a derived seed, whose known seed-independent collision
    // structures could collide both lanes at once. 64+32 = 96
    // independent bits: at 10^12 values the expected birthday
    // collisions are ~6e-6 (vs ~10^4 for one 64-bit lane), and both
    // lanes stay codegen'd native-input kernels (no string render —
    // the measured q83 cost the r15 MD5 form paid).
    def digest(c: org.apache.spark.sql.Column) =
      when(c.isNotNull, struct(
        xxhash64(c).as("h1"), hash(c).as("h2")))
    val entries =
      numeric.map(c => struct(lit(c).as("col_name"),
        col(c).cast("double").as("num_v"),
        col(c).cast("decimal(18,2)").as("num_dec"),
        digest(col(c)).as("str_h"))) ++
      other.map(c => struct(lit(c).as("col_name"),
        lit(null).cast("double").as("num_v"),
        lit(null).cast("decimal(18,2)").as("num_dec"),
        digest(col(c)).as("str_h")))
    val stacked = df.select(explode(array(entries: _*)).as("s"))
      .select(col("s.col_name"), col("s.num_v"), col("s.num_dec"),
        col("s.str_h"))
    val perValue = stacked.groupBy("col_name", "str_h")
      .agg(count(lit(1)).as("cnt"), min("num_v").as("mn"),
        max("num_v").as("mx"), sum("num_dec").as("sm"))
    perValue.groupBy("col_name")
      .agg(sum("cnt").as("n_rows"),
        sum(when(col("str_h").isNull, col("cnt")).otherwise(lit(0L)))
          .as("n_null"),
        count(when(col("str_h").isNotNull, lit(1))).as("n_distinct"),
        min("mn").as("min_v"), max("mx").as("max_v"),
        sum("sm").cast("double").as("sum_v"))
  }

  /** Single-pass MERGEABLE per-group quantile sketch via a deterministic
    * bottom-k-by-hash (KMV) sample — the one-pass complement of the
    * exact bucketed two-pass rank (q31/q69/q73): at 100 TB the exact
    * path costs two full corpus rounds per quantile batch, while this
    * sketch is ONE scan into bounded per-group state, and its samples
    * merge associatively (bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪
    * bottom-k(B)) — the identity the salted tournament's per-salt cells
    * already exploit, proved in ScalaTest), so partial sketches from
    * shards/days can be combined without re-scanning.
    *
    * Determinism and cross-engine exactness: the sample is selected by
    * md5 over the row's id columns — not a random() draw — so the same
    * rows are sampled on every run AND by DuckDB, making the quantile
    * ESTIMATES (pure selection from the sorted sample, no arithmetic)
    * oracle-exact even though the sketch is approximate vs the true
    * quantile. The statistical content — rank error O(1/√k) — is gated
    * separately in ScalaTest against the exact quantile. (At scale the
    * priority hash would be xxhash64 for speed; md5 keeps the oracle
    * replayable and is the repo's established cross-engine hash, as in
    * [[graft.functions.BottomKNgramMd5]].)
    *
    * Estimate convention: element at max(1, ceil(q·n)) of the sorted
    * sample (the inverse-CDF / type-1 quantile), n = |sample| ≤ k. */
  def quantileSketch(df: DataFrame, grp: Column, x: Column,
      idCols: Seq[Column], qs: Seq[Double], k: Int): DataFrame = {
    require(k > 0, s"sample size k must be positive: $k")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must lie in (0, 1]: $qs")
    // "|"-separated so distinct id tuples can never concatenate to the
    // same priority string ((12,3) vs (1,23))
    val pri = md5(concat_ws("|", idCols.map(_.cast("string")): _*))
    // per-group bottom-k by priority through the salted tournament —
    // never a bare per-group window over the corpus
    val sample = Skew.groupTopK(
      df.select(grp.as("g"), x.as("x"), pri.as("__p")),
      col("g"), Seq(col("__p").asc), Seq(col("__p")), n = k, nSalts = 8)
    sample
      .groupBy("g")
      // bounded: ≤ k sample values per group ride into the sort/list
      .agg(array_sort(collect_list(col("x"))).as("__s"),
        count(lit(1)).as("n_sample"))
      .select(col("g"), explode(typedlit(qs)).as("q"),
        col("__s"), col("n_sample"))
      .select(col("g"), col("q"),
        element_at(col("__s"),
          greatest(lit(1), ceil(col("q") * col("n_sample")).cast("int"))).as("est"),
        col("n_sample"))
  }

  /** Declarative data-quality audit (the dbt-test / Deequ shape): a
    * fixed battery of constraint checks over the warehouse tables,
    * each reduced to one (check, violations) row, unioned into a
    * single report frame.
    *
    * Scale shape — one pass per table, not one pass per check:
    * same-table column constraints (accepted values, ranges,
    * positivity, null/emptiness, derived-column consistency) FUSE into
    * a single map-side-combining conditional aggregate over one scan;
    * referential checks are LEFT joins that each also carry any
    * cross-table row predicate on the same key (orphan count and
    * ship-before-order count ride ONE lineitem⋈orders join), with
    * dimension sides broadcast. Every branch reduces to a 1-row frame
    * before the union, so the report assembly is free. At 100 TB the
    * audit costs: one scan per audited table + one join per FK family
    * — the minimum any checker can pay. */
  def dqAudit(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      part: DataFrame, documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast => bcast}
    def viol(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    // fused single-scan column constraints per table
    val liCols = lineitem.agg(
        viol(!col("l_returnflag").isin("A", "N", "R")).as("v1"),
        viol(col("l_discount") < 0 || col("l_discount") > 0.1).as("v2"),
        viol(col("l_quantity") <= 0).as("v3"))
      .selectExpr("stack(3, " +
        "'accepted_values:lineitem.l_returnflag', v1, " +
        "'range:lineitem.l_discount[0,0.1]', v2, " +
        "'positive:lineitem.l_quantity', v3) AS (check_name, violations)")
    val docCols = documents.agg(
        viol(col("text").isNull || length(col("text")) === 0).as("v1"),
        viol(col("n_chars") =!= length(col("text"))).as("v2"))
      .selectExpr("stack(2, " +
        "'not_empty:documents.text', v1, " +
        "'consistent:documents.n_chars=length(text)', v2) AS (check_name, violations)")
    // key uniqueness: rows in excess of distinct keys
    val pkCust = customer.agg(
      (count(lit(1)) - countDistinct(col("c_custkey"))).as("violations"))
      .select(lit("unique:customer.c_custkey").as("check_name"), col("violations"))
    // FK families: orphans (+ same-key row predicates) on ONE join each
    val ordCust = orders.join(
        bcast(customer.select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"), "left")
      .agg(viol(col("c_custkey").isNull).as("violations"))
      .select(lit("fk:orders.o_custkey->customer").as("check_name"), col("violations"))
    val liOrd = lineitem
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"), "left")
      .agg(
        viol(col("o_orderkey").isNull).as("v1"),
        viol(col("l_shipdate") < col("o_orderdate")).as("v2"))
      .selectExpr("stack(2, " +
        "'fk:lineitem.l_orderkey->orders', v1, " +
        "'order:lineitem.l_shipdate>=o_orderdate', v2) AS (check_name, violations)")
    val liPart = lineitem.join(bcast(part.select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"), "left")
      .agg(viol(col("p_partkey").isNull).as("violations"))
      .select(lit("fk:lineitem.l_partkey->part").as("check_name"), col("violations"))
    liCols.unionByName(docCols).unionByName(pkCust).unionByName(ordCust)
      .unionByName(liOrd).unionByName(liPart)
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
               -- outer CAST pins the result type to INT32: DuckDB 1.0's
               -- LEAST promotes to BIGINT, so without it the bin dtype
               -- (not its values) depends on the harness DuckDB version
               CAST(CASE WHEN hi = lo THEN 0
                    ELSE LEAST(CAST(FLOOR((l_extendedprice - lo) / ((hi - lo) / 16)) AS INT), 15)
               END AS INT) AS bin,
               COUNT(*) AS n
        FROM lineitem, b
        GROUP BY 1, 2
        ORDER BY l_returnflag, bin"""))
    ,
    Query(
      "q69_robust_outliers",
      "Median/MAD robust outlier accounting over the heavy-tailed event " +
        "value, per event type (k=3): the data-cleaning pass that survives " +
        "its own outliers (50% breakdown point vs mean/stddev's zero — the " +
        "tail would drag a z-score's own yardstick). Two exact-median " +
        "rounds, each the scale-safe bucketed two-pass rank of q31 — no " +
        "per-group single-task sort — with the tiny per-group stat frames " +
        "broadcast back; one final map-side-combining count. Exact-count " +
        "oracle: median interpolation bit-matches quantile_cont and the " +
        "flag arithmetic is IEEE-identical, so no tolerance band is needed.",
      (s, dir) => robustOutliers(
        Tables.events(s, dir)
          .select(col("event_type"), col("value").cast("double").as("x")),
        "event_type", k = 3.0)
        .orderBy("event_type"),
      Some("""
        WITH base AS (
          SELECT event_type, CAST(value AS DOUBLE) AS x
          FROM events WHERE value IS NOT NULL
        ), med AS (
          SELECT event_type, quantile_cont(x, 0.5) AS med
          FROM base GROUP BY 1
        ), mad AS (
          SELECT b.event_type, quantile_cont(abs(b.x - m.med), 0.5) AS mad
          FROM base b JOIN med m USING (event_type) GROUP BY 1
        )
        SELECT b.event_type, MAX(m.med) AS med, MAX(d.mad) AS mad,
               COUNT(*) FILTER (WHERE abs(b.x - m.med) > 3.0 * d.mad) AS n_outliers,
               COUNT(*) AS n
        FROM base b JOIN med m USING (event_type) JOIN mad d USING (event_type)
        GROUP BY 1
        ORDER BY event_type"""))
    ,
    Query(
      "q75_histogram_drift",
      "Distribution drift per event type between the even/odd event-id " +
        "cohorts of the value measure: scaled L1 distance " +
        "sum|nA*TB - nB*TA| over 16 shared-bounds equi-width bins — " +
        "INTEGER arithmetic end to end, so the metric is exact, " +
        "aggregation-order-free, and engine-identical (a double share " +
        "sum would wobble in the last bits with partial-agg order). One " +
        "corpus scan, one broadcast bounds row, count-only exchanges — " +
        "the monitoring pass that catches a silent upstream distribution " +
        "change before it poisons training data.",
      (s, dir) => histogramDrift(
        Tables.events(s, dir),
        group = col("event_type"), cohort = pmod(col("event_id"), lit(2)),
        x = col("value"), nBins = 16)
        .select(col("g").as("event_type"), col("drift_scaled"),
          col("n_a"), col("n_b"))
        .orderBy("event_type"),
      Some("""
        WITH b AS (
          SELECT MIN(value) AS lo, MAX(value) AS hi FROM events
        ), binned AS (
          SELECT event_type,
                 CASE WHEN hi = lo THEN 0
                      ELSE LEAST(CAST(FLOOR((value - lo) / ((hi - lo) / 16)) AS INT), 15)
                 END AS bin,
                 COUNT(*) FILTER (WHERE event_id % 2 = 0) AS na,
                 COUNT(*) FILTER (WHERE event_id % 2 = 1) AS nb
          FROM events, b
          GROUP BY 1, 2
        ), tot AS (
          SELECT event_type, CAST(SUM(na) AS BIGINT) AS ta,
                 CAST(SUM(nb) AS BIGINT) AS tb
          FROM binned GROUP BY 1
        )
        SELECT event_type,
               CAST(SUM(ABS(na * tb - nb * ta)) AS BIGINT) AS drift_scaled,
               MAX(ta) AS n_a, MAX(tb) AS n_b
        FROM binned JOIN tot USING (event_type)
        GROUP BY 1
        ORDER BY event_type"""))
    ,
    Query(
      "q83_profile_columns",
      "All-columns data-card profile of lineitem in ONE scan: per-column " +
        "rows/nulls/exact-distinct plus min/max/decimal-exact sum for " +
        "the numeric columns — map-side unpivot into a (col, value) " +
        "double aggregate, so the exchange carries at most one partial " +
        "row per distinct value per column (never m copies of the raw " +
        "rows, which is what an m-way COUNT(DISTINCT) Expand would " +
        "ship). The oracle recomputes every column's stats as separate " +
        "direct aggregates — proving the shared-scan fold exact.",
      (s, dir) => profileColumns(
        Tables.lineitem(s, dir),
        numeric = Seq("l_orderkey", "l_quantity", "l_extendedprice",
          "l_discount", "l_tax"),
        other = Seq("l_returnflag", "l_linestatus", "l_shipdate"))
        .orderBy("col_name"),
      Some("""
        SELECT 'l_orderkey' AS col_name, COUNT(*) AS n_rows,
               COUNT(*) - COUNT(l_orderkey) AS n_null,
               COUNT(DISTINCT l_orderkey) AS n_distinct,
               CAST(MIN(l_orderkey) AS DOUBLE) AS min_v,
               CAST(MAX(l_orderkey) AS DOUBLE) AS max_v,
               CAST(SUM(CAST(l_orderkey AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        FROM lineitem
        UNION ALL
        SELECT 'l_quantity', COUNT(*), COUNT(*) - COUNT(l_quantity),
               COUNT(DISTINCT l_quantity),
               CAST(MIN(l_quantity) AS DOUBLE), CAST(MAX(l_quantity) AS DOUBLE),
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', COUNT(*), COUNT(*) - COUNT(l_extendedprice),
               COUNT(DISTINCT l_extendedprice),
               CAST(MIN(l_extendedprice) AS DOUBLE), CAST(MAX(l_extendedprice) AS DOUBLE),
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        FROM lineitem
        UNION ALL
        SELECT 'l_discount', COUNT(*), COUNT(*) - COUNT(l_discount),
               COUNT(DISTINCT l_discount),
               CAST(MIN(l_discount) AS DOUBLE), CAST(MAX(l_discount) AS DOUBLE),
               CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
        FROM lineitem
        UNION ALL
        SELECT 'l_tax', COUNT(*), COUNT(*) - COUNT(l_tax),
               COUNT(DISTINCT l_tax),
               CAST(MIN(l_tax) AS DOUBLE), CAST(MAX(l_tax) AS DOUBLE),
               CAST(SUM(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE)
        FROM lineitem
        UNION ALL
        SELECT 'l_returnflag', COUNT(*), COUNT(*) - COUNT(l_returnflag),
               COUNT(DISTINCT l_returnflag),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        FROM lineitem
        UNION ALL
        SELECT 'l_linestatus', COUNT(*), COUNT(*) - COUNT(l_linestatus),
               COUNT(DISTINCT l_linestatus),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        FROM lineitem
        UNION ALL
        SELECT 'l_shipdate', COUNT(*), COUNT(*) - COUNT(l_shipdate),
               COUNT(DISTINCT l_shipdate),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        FROM lineitem
        ORDER BY col_name""")),

    Query(
      "q95_quantile_sketch",
      "Single-pass MERGEABLE per-group quantile sketch: a deterministic " +
        "bottom-1024-by-md5 (KMV) sample of l_extendedprice per return " +
        "flag through the salted tournament (one scan, bounded per-group " +
        "state), quantile estimates {0.25, 0.5, 0.75, 0.95} selected from " +
        "the sorted sample. The one-pass complement of the exact bucketed " +
        "two-pass rank (q31/q69/q73): at 100 TB the exact path costs two " +
        "full corpus rounds, the sketch one, and partial sketches from " +
        "shards/days MERGE (bottom-k(A u B) = bottom-k(bottom-k(A) u " +
        "bottom-k(B)), proved in ScalaTest). ORACLE-EXACT despite being " +
        "approximate: the hash-selected sample is the same row set in " +
        "both engines and the estimate is pure selection, no arithmetic; " +
        "the O(1/sqrt(k)) rank-error bound vs the TRUE quantile is gated " +
        "separately in ScalaTest.",
      (s, dir) =>
        quantileSketch(Tables.lineitem(s, dir),
            col("l_returnflag"), col("l_extendedprice"),
            Seq(col("l_orderkey"), col("l_linenumber")),
            qs = Seq(0.25, 0.5, 0.75, 0.95), k = 1024)
          .select(col("g").as("l_returnflag"), col("q"), col("est"), col("n_sample"))
          .orderBy("l_returnflag", "q"),
      Some("""
        WITH pri AS (
          SELECT l_returnflag AS g, l_extendedprice AS x,
                 md5(CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)) AS p
          FROM lineitem
        ), samp AS (
          SELECT g, x FROM (
            SELECT g, x, row_number() OVER (PARTITION BY g ORDER BY p) AS rn
            FROM pri) t
          WHERE rn <= 1024
        ), sorted AS (
          SELECT g, list_sort(list(x)) AS s, COUNT(*) AS n_sample
          FROM samp GROUP BY g
        )
        SELECT g AS l_returnflag, q,
               s[GREATEST(1, CAST(CEIL(q * n_sample) AS BIGINT))] AS est,
               n_sample
        FROM sorted CROSS JOIN
             (SELECT UNNEST(CAST([0.25, 0.5, 0.75, 0.95] AS DOUBLE[])) AS q) qs
        ORDER BY l_returnflag, q"""))
    ,
    Query(
      "q113_dq_audit",
      "Declarative data-quality audit (dbt-test/Deequ shape): a 10-check " +
        "battery — accepted values, range, positivity, non-emptiness, " +
        "derived-column consistency, key uniqueness, three FK families, " +
        "and a cross-table temporal order rule — each reduced to one " +
        "(check_name, violations) row. Same-table checks fuse into one " +
        "conditional aggregate per scan; orphan and ship-before-order " +
        "counts ride ONE lineitem joins orders pass; dims broadcast. The " +
        "synthetic data plants a real violation: lineitems shipping " +
        "before their order date.",
      (s, dir) =>
        dqAudit(Tables.customer(s, dir), Tables.orders(s, dir),
          Tables.lineitem(s, dir), Tables.part(s, dir),
          Tables.documents(s, dir))
          .orderBy("check_name"),
      Some("""
        SELECT * FROM (
          SELECT 'accepted_values:lineitem.l_returnflag' AS check_name,
                 CAST(SUM(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT) AS violations
          FROM lineitem
          UNION ALL
          SELECT 'range:lineitem.l_discount[0,0.1]',
                 CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT)
          FROM lineitem
          UNION ALL
          SELECT 'positive:lineitem.l_quantity',
                 CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
          FROM lineitem
          UNION ALL
          SELECT 'not_empty:documents.text',
                 CAST(SUM(CASE WHEN text IS NULL OR LENGTH(text) = 0 THEN 1 ELSE 0 END) AS BIGINT)
          FROM documents
          UNION ALL
          SELECT 'consistent:documents.n_chars=length(text)',
                 CAST(SUM(CASE WHEN n_chars <> LENGTH(text) THEN 1 ELSE 0 END) AS BIGINT)
          FROM documents
          UNION ALL
          SELECT 'unique:customer.c_custkey',
                 CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT)
          FROM customer
          UNION ALL
          SELECT 'fk:orders.o_custkey->customer',
                 CAST(COUNT(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT)
          FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
          UNION ALL
          SELECT 'fk:lineitem.l_orderkey->orders',
                 CAST(COUNT(*) FILTER (WHERE o.o_orderkey IS NULL) AS BIGINT)
          FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
          UNION ALL
          SELECT 'order:lineitem.l_shipdate>=o_orderdate',
                 CAST(COUNT(*) FILTER (WHERE l.l_shipdate < o.o_orderdate) AS BIGINT)
          FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
          UNION ALL
          SELECT 'fk:lineitem.l_partkey->part',
                 CAST(COUNT(*) FILTER (WHERE p.p_partkey IS NULL) AS BIGINT)
          FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
        ) ORDER BY check_name"""))
  )
}
