package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet test tables (TESTDATA.md).
  *
  * Schema-on-read comes from the parquet footers; Catalyst prunes columns
  * and pushes predicates into the scan automatically, so every query built
  * on these loaders gets `PushedFilters`/`ReadSchema` pruning for free —
  * the Spark-native equivalent of the reference's hand-rolled positional
  * column pruning (reference `ETL.java:101-105,147`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Adapt file-derived scan parallelism to the cluster's — for inputs
    * feeding HEAVY per-row pipelines only. A table whose parquet layout
    * yields fewer splits than the cluster has cores (the test tables are
    * single-row-group files → exactly ONE split) pins every downstream
    * map-side stage to one core; redistributing across
    * `defaultParallelism` engages them all. The branch fires only when
    * scan parallelism is below the core count, so the exchange moves at
    * most a few scan-partitions' worth of bytes — and on a real cluster
    * reading many-row-group files it does not fire at all. The explicit
    * partition count keeps AQE from coalescing the exchange back down
    * (AQE respects user-specified numPartitions).
    *
    * Deliberately NOT applied in [[load]]: for cheap-per-row consumers
    * (plain partial aggregates, SRP plane dots) the measured A/B shows
    * the extra full-table shuffle COSTS more than the parallelism gains —
    * partial aggregation already reduces on the scan side. Callers with
    * expensive per-row derivation (MinHash/SimHash signature hashing:
    * ~200 hash evaluations per exploded shingle row) opt in.
    *
    * Only scan-shaped plans (leaf + project/filter, no joins/aggregates/
    * shuffles) are ever probed: on anything else `df.rdd` would make AQE
    * EXECUTE every upstream exchange stage just to report a partition
    * count — real jobs whose results are then thrown away and recomputed
    * by the actual query. Shuffle-bearing inputs already own their
    * parallelism (shuffle.partitions), so they pass through untouched. */
  def rebalanced(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
    def scanShaped(p: LogicalPlan): Boolean = p match {
      case Project(_, c) => scanShaped(c)
      case Filter(_, c) => scanShaped(c)
      case leaf if leaf.children.isEmpty => true
      case _ => false
    }
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (scanShaped(df.queryExecution.optimizedPlan) &&
      df.rdd.getNumPartitions < target) df.repartition(target)
    else df
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  /** `events.parquet` carries INT64 TIMESTAMP(NANOS) which Spark's reader
    * rejects unless `spark.sql.legacy.parquet.nanosAsLong=true`; with it,
    * `ts` reads as epoch nanoseconds (LongType) — exact, and cheaper to
    * compare/lag than timestamps anyway. The conf is set at session
    * construction (Bench/Verify/EtlMain/SparkTestSession via
    * [[graft.GraftSession]]), not mutated here: a loader silently
    * flipping session state would race under concurrent use. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // A session built without GraftSession would otherwise die inside the
    // parquet reader with an opaque nanos-timestamp error — turn the
    // contract violation into an actionable message instead.
    require(
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "events.parquet carries INT64 TIMESTAMP(NANOS): build the session via " +
        "graft.GraftSession (or set spark.sql.legacy.parquet.nanosAsLong=true " +
        "at session construction) before reading it")
    load(spark, dir, "events")
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
