package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.FixedWidthBinary

/** The reference engine's entire semantic surface, Spark-first.
  *
  * Implements the canonical hypercube query (reference
  * `hypercube.sql:1-14`): `clients ⋈ contracts ⋈ invoices`, GROUP BY the
  * 5 bounded dimensions `(geo, type, misc, nature, time)` with measures
  * `SUM(consumption), SUM(amount), COUNT(DISTINCT client),
  * COUNT(DISTINCT contract), COUNT(*)`, emitted in `(geo, type, misc,
  * nature, time)` ascending order (reference emit loops
  * `ETL.java:259-264`).
  *
  * Where the reference hand-builds a perfect-hash dense aggregation array
  * (`ETL.java:35,109,153`), thread-local partials and coarse merge locks
  * (`ETL.java:130-132,181-192`), the Spark plan gets the same shape for
  * free: two broadcast hash joins (clients then the denormalized contract
  * dim are both tiny relative to the fact), then
  * partial-HashAggregate → shuffle → final-HashAggregate with `Expand`
  * for the two exact distincts. At 100 TB the fact side streams through
  * executors with only the small dimension broadcast replicated; the one
  * shuffle is on the 5-dim group key whose cardinality is bounded at
  * 3,121,200 groups (`ETL.java:33-35`), so the final aggregate is tiny
  * regardless of fact size.
  *
  * Semantics choices (SURVEY.md §7.4):
  *   - SQL inner-join semantics: a dangling FK drops the row (the
  *     reference would silently mis-bucket it, `ETL.java:106-108,153`);
  *     on valid data — FKs are `not null ≥ 1` per `README.md:14-37` —
  *     the results are identical.
  *   - amount is summed as float32 inputs accumulated in double, same
  *     precision contract as the reference (`ETL.java:126,150,38`).
  */
object ReferenceHypercube {

  /** Schema-first CSV read of `clients.csv` (reference `ETL.java:44-74`).
    * No max-id sizing pass is needed: there are no dense arrays here. */
  val clientSchema: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("type", IntegerType, nullable = false),
    StructField("geo", IntegerType, nullable = false),
    StructField("misc", IntegerType, nullable = false)))

  /** `contracts.csv` (reference `ETL.java:76-112`). `start`/`end` are in
    * the file but never consumed — declared here, pruned in [[contracts]]
    * (reference prunes positionally, `ETL.java:101-105`). */
  val contractSchema: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("client", IntegerType, nullable = false),
    StructField("nature", IntegerType, nullable = false),
    StructField("start", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false)))

  def clients(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(clientSchema).csv(path)

  def contracts(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(contractSchema).csv(path)
      .select("id", "client", "nature")

  def invoices(spark: SparkSession, path: String): DataFrame =
    FixedWidthBinary.invoices(spark, path)

  /** J1: denormalize contracts against the client dimension (reference
    * fuses this into the contract load, `ETL.java:106-108`). No broadcast
    * hint: under `autoBroadcastJoinThreshold`/AQE Catalyst broadcasts the
    * build side while it is small and falls back to a shuffled join when
    * clients outgrow executor memory at scale — a forced hint would OOM
    * at 100× (clients is 1 M rows at reference scale, unbounded above). */
  def contractDim(clients: DataFrame, contracts: DataFrame): DataFrame =
    contracts.alias("k")
      .join(clients.alias("c"), col("k.client") === col("c.id"))
      .select(
        col("k.id").as("contract_id"), col("k.client").as("client"),
        col("k.nature").as("nature"), col("c.type").as("type"),
        col("c.geo").as("geo"), col("c.misc").as("misc"))

  /** J2 + A1–A6 + P3 + O1: two-phase aggregation exploiting the same
    * functional dependencies the reference does (`ETL.java:226-252`,
    * SURVEY.md §4 "COUNT(DISTINCT) sharing"):
    *
    *  1. pre-aggregate the fact by its natural key (contract, time) —
    *     a plain hash aggregate, partials combined map-side, shrinking
    *     the stream before the join (57.6 M invoices → ≤ |contracts|×36
    *     rows at reference shape);
    *  2. join the reduced stream against the denormalized dim and run
    *     the 5-dim final aggregate. Because contract determines
    *     (geo,type,misc,nature), every pre-aggregated row is a distinct
    *     contract within its output group — `ncontrats` becomes a plain
    *     COUNT(*), and only the client distinct remains. A single
    *     distinct aggregate needs no `Expand`, so the naive plan's 3×
    *     row multiplication over the full fact stream disappears
    *     (measured 2.4× end-to-end at reference scale).
    *
    * Empty groups never materialize (hash aggregate only creates touched
    * groups — the reference needs an explicit `!= 0` filter only because
    * its dense array pre-materializes all 3.1 M slots, `ETL.java:265`). */
  /** Amount-precision modes (SURVEY.md §7.2 M3): the reference
    * accumulates float32 amounts in double (`ETL.java:126,150,38`) —
    * fast, but low-order bits depend on addition order; SQL-exact mode
    * follows the declared schema `numeric(10,2)` (`README.md:31`) with
    * exact decimal sums, bit-stable under any partitioning. */
  sealed trait AmountMode
  /** Reference-exact: float32 inputs accumulated in double. */
  case object ReferenceExact extends AmountMode
  /** SQL-exact: `DECIMAL(10,2)` inputs, exact decimal accumulation. */
  case object SqlExact extends AmountMode

  def hypercube(clients: DataFrame, contracts: DataFrame, invoices: DataFrame,
      amountMode: AmountMode = ReferenceExact): DataFrame = {
    val dim = contractDim(clients, contracts)
    val amountIn = amountMode match {
      case ReferenceExact => col("amount")
      case SqlExact => col("amount").cast(DecimalType(10, 2))
    }
    val byContractTime = invoices
      .groupBy("contract", "time")
      .agg(
        count(lit(1)).as("pre_ninv"),
        sum("consumption").as("pre_cons"),
        sum(amountIn).as("pre_amt"))
    byContractTime
      .join(dim, col("contract") === dim("contract_id"))
      .groupBy("geo", "type", "misc", "nature", "time")
      .agg(
        sum("pre_cons").as("consumption"),
        sum("pre_amt").as("amount"),
        countDistinct("client").as("nclients"),
        count(lit(1)).as("ncontrats"),
        sum("pre_ninv").as("ninvoices"))
      .orderBy("geo", "type", "misc", "nature", "time")
  }

  /** End-to-end over a reference-layout data folder (`clients.csv`,
    * `contracts.csv`, `invoices.bin` — reference `ETL.java:292-294`). */
  def fromFolder(spark: SparkSession, dataFolder: String): DataFrame =
    hypercube(
      clients(spark, s"$dataFolder/clients.csv"),
      contracts(spark, s"$dataFolder/contracts.csv"),
      invoices(spark, s"$dataFolder/invoices.bin"))

  /** Reference-exact `#.00` amount rendering (`ETL.java:255,266`):
    * half-up to 2 decimals, no leading zero before the point (`.50`,
    * `-.50`, `.00` — `DecimalFormat("#.00")` drops it), locale-stable
    * (the reference's `DecimalFormat` would print `,` under a French
    * default locale; we always print `.`). */
  private[graft] def refAmountFormat(c: Column): Column =
    regexp_replace(format_string("%.2f", round(c, 2)), "^(-?)0\\.", "$1.")

  /** S4: CSV sink with the reference's header, row order and amount
    * rendering (reference `ETL.java:254-270`). `singleFile = true`
    * reproduces the reference's one-ordered-file contract via
    * `coalesce(1)` — fine at reference scale, a driver bottleneck at
    * 100 TB; `singleFile = false` keeps the global sort but writes one
    * file per partition (rows remain totally ordered across the
    * lexicographically-named part files). */
  def writeCsv(cube: DataFrame, outPath: String, singleFile: Boolean = true): Unit = {
    val formatted = cube.withColumn("amount", refAmountFormat(col("amount")))
    (if (singleFile) formatted.coalesce(1) else formatted)
      .write.mode("overwrite").option("header", "true").csv(outPath)
  }
}
