package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.BinaryType

import graft.Query
import graft.sources.Tables

/** Bloom-filter semi-join — the explicit form of the runtime-filter
  * pattern (Spark's own `InjectRuntimeFilter`, Snowflake/Trino dynamic
  * filtering): when a selective dimension drives a semi-join against a
  * huge fact, ship a BITMAP of the dim keys to the fact scan instead of
  * shuffling the whole fact to the join.
  *
  * Mechanics: one aggregate over the dim builds a bloom filter of
  * `xxhash64(key)` (Spark's own `BloomFilterAggregate` — partial
  * bloom buffers merge map-side, so the build costs a dim scan plus a
  * one-row exchange); the resulting ~1 MB binary travels to the fact
  * scan as a LITERAL predicate (`BloomFilterMightContain`, codegen'd),
  * discarding non-matching fact rows BEFORE the join shuffle. The
  * then-tiny survivor set still runs the real semi-join, so bloom false
  * positives are removed and the result is EXACTLY the plain semi-join
  * — which is what the oracle checks.
  *
  * At 100 TB this is the difference between shuffling the full fact
  * (bounded only by the scan) and shuffling ~selectivity × fact + the
  * fp-rate dregs. The one-row driver hop for the filter binary is the
  * same shape as a broadcast build and is size-bounded by `numBits`.
  */
object BloomJoin {

  /** Bloom filter of `xxhash64(key)` over `dim` as a one-row binary. */
  private def buildBloom(dim: DataFrame, dimKey: Column,
      expectedItems: Long, numBits: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      shim.expression(xxhash64(dimKey)),
      Literal(expectedItems), Literal(numBits), 0, 0)
    dim.select(shim.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** `fact LEFT SEMI JOIN dim ON factKey = dimKey`, pre-filtered by a
    * bloom filter of the dim keys pushed to the fact scan. Exact: the
    * residual semi-join removes bloom false positives.
    *
    * The two keys must have the SAME data type — enforced, because the
    * exactness argument needs it: `xxhash64` hashes the raw
    * representation (an int 1 and a long 1L hash differently), while the
    * residual equi-join COERCES its sides, so mismatched key types would
    * turn bloom misses into silent false NEGATIVES — dropped matching
    * rows — instead of an error. Callers with mixed-width keys cast at
    * the call site, which makes the coercion explicit on both paths. */
  def bloomSemiJoin(fact: DataFrame, factKey: Column, dim: DataFrame,
      dimKey: Column, expectedItems: Long = 1000000L,
      numBits: Long = 8388608L): DataFrame = {
    val factType = fact.select(factKey).schema.head.dataType
    val dimType = dim.select(dimKey).schema.head.dataType
    require(factType == dimType,
      s"bloomSemiJoin keys must share one data type (xxhash64 is " +
        s"representation-sensitive, the residual join coerces): " +
        s"fact=$factType dim=$dimType — cast both keys explicitly")
    val bloom = buildBloom(dim, dimKey, expectedItems, numBits)
    val might = shim.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), shim.expression(xxhash64(factKey))))
    fact.filter(might).join(dim, factKey === dimKey, "left_semi")
  }

  val queries: Seq[Query] = Seq(
    Query(
      "q50_bloom_semi",
      "Bloom-filter semi-join: lineitem rows whose order is 1-URGENT. A " +
        "bloom filter of the urgent order keys (Spark's BloomFilterAggregate, " +
        "map-side-merging partials into one ~1 MB binary) is pushed to the " +
        "fact scan as a codegen'd literal predicate, so non-matching fact " +
        "rows die before the join shuffle; the residual semi-join removes " +
        "bloom false positives, making the result EXACTLY the plain " +
        "semi-join the oracle runs. The explicit form of the runtime-filter " +
        "pattern every warehouse engine applies at scale.",
      (s, dir) => {
        val urgent = Tables.orders(s, dir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"))
        bloomSemiJoin(
            Tables.lineitem(s, dir)
              .select("l_orderkey", "l_linenumber", "l_quantity"),
            col("l_orderkey"), urgent, col("o_orderkey"))
          .groupBy("l_orderkey")
          .agg(count(lit(1)).as("n_lines"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
          .orderBy("l_orderkey")
      },
      Some("""
        SELECT l_orderkey, COUNT(*) AS n_lines,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        GROUP BY l_orderkey
        ORDER BY l_orderkey"""))
  )
}
