package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Query
import graft.sources.Tables

/** Deterministic global training order — the "shuffle the corpus" step
  * a training run performs before reading examples: every document gets
  * a contiguous global position `train_pos` in [0, N), ordered by an
  * md5 shuffle key, so the read order is uniformly mixed across sources
  * yet bit-reproducible on every run, engine, and cluster size (the
  * same content-stable-hash argument as q35's split: an RNG order is
  * neither reproducible nor partitioning-stable). The order is
  * EPOCH-PARAMETERIZED: re-keying the hash with the epoch number yields
  * a fresh, uncorrelated, equally deterministic permutation per epoch —
  * reshuffling 100 TB is a pure metadata recompute, no state carried
  * between epochs.
  *
  * The scale problem is the position itself: `row_number() OVER (ORDER
  * BY key)` with no partition funnels the whole corpus through ONE task
  * (q31's single-task pathology; Spark warns "No Partition Defined for
  * Window operation"). Assignment instead rides [[Shards.prefixOffsets]]
  * — the two-pass distributed prefix sum — with UNIT weight, so the
  * exclusive running total IS the global row index: range-partition on
  * the shuffle key (md5 keys are uniform, so range partitions are
  * balanced by construction), per-partition counts, broadcast exclusive
  * offsets, within-partition scan. Parallelism equals the partition
  * count at any corpus size, and the DuckDB oracle checks the result
  * against the naive one-window ROW_NUMBER formulation exactly. */
object TrainOrder {

  /** The epoch-keyed shuffle key: md5 over "epoch:key" — uniform,
    * content-stable, and a different permutation for every epoch. */
  def shuffleKey(key: Column, epoch: Int): Column =
    md5(concat_ws(":", lit(epoch.toString), key.cast("string")))

  /** All input columns plus `train_pos`: the row's contiguous global
    * position in (shuffleKey, key) order — unit-weight
    * [[Shards.prefixOffsets]], never a global single-task window.
    * `key` must be unique per row (it tie-breaks identical md5 keys).
    *
    * Cache contract: the prefix sum's internal range-partitioned frame
    * stays persisted (the jaccardJoin contract — batch drivers
    * `clearCache()` between queries). */
  def trainOrder(rows: DataFrame, key: Column, epoch: Int): DataFrame = {
    val keyed = rows.withColumn("__sk", shuffleKey(key, epoch))
    val (off, _) =
      Shards.prefixOffsets(keyed, Seq(col("__sk"), key), lit(1L))
    off.withColumn("train_pos", col("start_off")).drop("__sk", "start_off")
  }

  val queries: Seq[Query] = Seq(
    Query(
      "q81_train_order",
      "Deterministic global training order (epoch 1): every doc gets a " +
        "contiguous position in md5('epoch:doc_id') order — a content-" +
        "stable corpus shuffle that mixes sources uniformly, re-keyed " +
        "per epoch. Positions come from the q41 two-pass distributed " +
        "prefix sum with unit weight (range-partition on the hash key, " +
        "broadcast exclusive offsets, within-partition scan) — never " +
        "row_number over a global single-task window, which is what the " +
        "DuckDB oracle runs to check the assignment is the naive " +
        "window's, exactly.",
      (s, dir) =>
        trainOrder(
          Tables.documents(s, dir).select(col("doc_id"), col("source")),
          col("doc_id"), epoch = 1)
          .select(col("doc_id"), col("source"), col("train_pos"))
          .orderBy("train_pos"),
      Some("""
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                 ORDER BY md5(CAST(1 AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)),
                          doc_id) - 1 AS train_pos
        FROM documents
        ORDER BY train_pos"""))
  )
}
