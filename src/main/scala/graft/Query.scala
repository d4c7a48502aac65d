package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a named operator demonstration over the test
  * tables, with an optional ANSI-SQL twin for the DuckDB oracle.
  *
  * Driver contract (see SparkEntry): `run(spark, sfDir)` must return a
  * deterministic DataFrame whose column names match the oracle's exactly
  * (the driver sorts columns by name before hashing), and whose row
  * order is pinned by an explicit sort on a unique key prefix.
  *
  * Numeric-parity rules used throughout the catalog:
  *   - double measures are summed as `DECIMAL(18,2)` then cast back to
  *     double — exact in both Spark and DuckDB, so results are
  *     bit-identical regardless of partial-aggregation order (a plain
  *     double sum would differ in low-order bits between engines);
  *   - derived products (`price * (1 - discount)`) cast each *operand* to
  *     decimal and multiply in the decimal domain on both sides; casting
  *     the double product instead is NOT engine-stable (Spark rounds
  *     HALF_UP on the shortest decimal string, DuckDB rounds the true
  *     binary value — they disagree on ties like 48887.7749999…94);
  *   - counts are 64-bit in both engines; `year`/`month`/`row_number`
  *     are cast to INT on the DuckDB side to match Spark's types.
  */
final case class Query(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    oracleFn: Option[() => Option[String]] = None) {

  /** The oracle SQL as of NOW: the static `oracle` if present, else the
    * late-bound thunk (entries whose SQL embeds a staged artifact root
    * set by their own `run` — the q110/q102 staged-fingerprint/twin
    * conventions). A thunk (rather than a var read at catalog-assembly
    * time) keeps the catalog SNAPSHOT-SAFE: a harness that enumerates
    * the catalog once before running entries still sees the staged
    * oracle afterwards (round-13 advice). `Verify` asserts after a full
    * run that every thunk-bearing entry actually resolved — an entry
    * documented as oracle-gated can't silently degrade to rows-only. */
  def oracleNow: Option[String] = oracle.orElse(oracleFn.flatMap(_()))
}
