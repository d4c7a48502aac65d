package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst typed-imperative AGGREGATE computing a Misra–Gries
  * frequent-items summary (Misra & Gries 1982; mergeability per Agarwal
  * et al., "Mergeable Summaries", PODS 2012 — both public literature).
  *
  * Guarantee (k counters over n items): every item with true frequency
  * > n/(k+1) is present in the summary, and each reported count
  * under-counts the true frequency by at most n/(k+1). That makes it
  * the bounded-memory heavy-hitters primitive: state is O(k) per
  * partial aggregate REGARDLESS of corpus size or distinct-item count —
  * the exact `groupBy(token).count` twin shuffles every distinct item,
  * this shuffles k counters per map partition.
  *
  * Partials merge by counter addition followed by the standard trim:
  * subtract the (k+1)-largest merged count from everything and drop
  * non-positives — the merged summary keeps the same error bound, so
  * map-side combine works exactly like any built-in aggregate. (The
  * surviving counts — though not the guarantee — can depend on input
  * partitioning, like any order-sensitive sketch; tests assert the
  * GUARANTEE, and catalog use fixes the partitioning.)
  *
  * `eval` emits `array<struct<item string, count bigint>>` sorted by
  * (count DESC, item ASC) — deterministic given the final summary.
  */
case class FrequentItemsSketch(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k > 0 && k <= 4096, s"counter count must be in [1, 4096], got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string item, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "frequent_items"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf // null items don't count, like count(col)
    val item = v.asInstanceOf[UTF8String]
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1)
      case None if buf.size < k =>
        // clone: the UTF8String may point into a reused scan buffer
        buf.update(item.clone(), 1L)
      case None =>
        // Misra–Gries decrement step: charge the unseen item against
        // every counter; zeros vacate their slots. Iterate a key
        // SNAPSHOT: mutating (even non-structurally) while walking the
        // live iterator only happens to be safe under today's HashMap
        // internals — the copy decouples us from that implementation
        // detail, and the buffer is at most k (≤4096) keys.
        val keys = buf.keys.toArray
        var i = 0
        while (i < keys.length) {
          val key = keys(i)
          val c = buf(key) - 1
          if (c == 0) buf.remove(key) else buf.update(key, c)
          i += 1
        }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[UTF8String, Long],
      b2: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b2.foreach { case (item, c) =>
      b1.update(item, b1.getOrElse(item, 0L) + c)
    }
    if (b1.size > k) {
      // trim to k: subtract the (k+1)-largest count everywhere — the
      // Agarwal et al. merge preserving the n/(k+1) error bound
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (k + 1)) // (k+1)-largest
      // key snapshot, same rationale as in update()
      val keys = b1.keys.toArray
      var i = 0
      while (i < keys.length) {
        val key = keys(i)
        val c = b1(key) - cut
        if (c <= 0) b1.remove(key) else b1.update(key, c)
        i += 1
      }
    }
    b1
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buf.toArray.sortWith { case ((i1, c1), (i2, c2)) =>
      if (c1 != c2) c1 > c2 else i1.compareTo(i2) < 0
    }
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(item, c)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val bytes = item.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItemsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItemsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FrequentItemsSketch =
    copy(child = newChild)
}

object FrequentItemsSketch {
  /** Aggregate Column: Misra–Gries summary of `item` with `k` counters,
    * as `array<struct<item, count>>` sorted by (count DESC, item ASC). */
  def frequentItems(item: Column, k: Int): Column =
    shim.column(FrequentItemsSketch(shim.expression(item), k).toAggregateExpression())
}
