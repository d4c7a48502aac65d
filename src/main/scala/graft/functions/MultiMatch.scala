package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression counting dictionary hits with an
  * Aho–Corasick automaton in one fused per-row pass:
  * `struct<n_hits, n_terms>` — total occurrences of any dictionary term
  * (overlapping occurrences counted, the regex-alternation semantics)
  * and the number of DISTINCT terms that occur at least once.
  *
  * This is the ≳10⁴-term path that
  * [[graft.operators.TextAnalysis.blocklistHits]]'s design names: a
  * boundary-anchored alternation regex is the right tool for a
  * 3–3,000-term blocklist, but java.util.regex compiles alternations
  * into backtracking NFAs whose match cost grows with the term count —
  * an Aho–Corasick automaton matches ALL terms simultaneously in
  * O(text + hits) regardless of dictionary size, which is how
  * production safety/PII term scans run at web scale.
  *
  * Scale shape: pure map work inside whole-stage codegen — no shuffle,
  * no UDF boundary, no token explode; the kernel is a static module
  * call (the [[DeflateStats]] pattern). The automaton is built ONCE per
  * JVM per distinct dictionary (a content-keyed cache resolved inside
  * the kernel — tasks never serialize automaton state; only the term
  * list rides the codegen references array); the dictionary itself
  * rides the expression as a plain `Seq[String]` — at 10⁴ short terms that is
  * ~100 KB of task closure, and a deployment with 10⁶-term dictionaries
  * would swap the field for a `Broadcast` handle without touching the
  * kernel. Matched-output lists are precomputed per node (own id +
  * suffix-link outputs), so the inner loop is two array reads per
  * character.
  *
  * Token-boundary semantics are the CALLER's contract: pad the haystack
  * and every term with the separator (see
  * `TextAnalysis.dictHitStats`) — padded terms share separators in the
  * automaton exactly like lookaround anchors share them in the regex
  * path, so adjacent hits ("slow slow") both count. */
case class MultiMatchStats(child: Expression, terms: Seq[String])
  extends UnaryExpression {

  require(terms.nonEmpty && terms.forall(_.nonEmpty),
    "multi_match_stats needs a non-empty dictionary of non-empty terms")
  require(terms.distinct.length == terms.length,
    "multi_match_stats dictionary terms must be distinct")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string haystack, got ${other.simpleString}")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("n_hits", LongType, nullable = false),
    StructField("n_terms", LongType, nullable = false)))
  override def prettyName: String = "multi_match_stats"

  override def nullSafeEval(input: Any): Any =
    MultiMatchStats.compute(input.asInstanceOf[UTF8String], terms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // only the (serializable) term list rides the codegen references
    // array — the automaton itself is resolved from the per-JVM cache
    // inside the kernel, so tasks never serialize automaton state
    val termsRef = ctx.addReferenceObj("terms", terms,
      "scala.collection.immutable.Seq")
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.functions.MultiMatchStats$$.MODULE$$.compute($text, $termsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiMatchStats =
    copy(child = newChild)
}

object MultiMatchStats {

  /** Per-JVM automaton cache keyed by the term list (content equality):
    * executors build each distinct dictionary's automaton exactly once,
    * on first row; the per-row lookup is one ConcurrentHashMap get.
    * Unbounded by design — a process sees a handful of dictionaries,
    * each worth keeping for its lifetime (the DeflateStats ThreadLocal
    * economics, shared across threads because the automaton is
    * read-only after construction). */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], AhoCorasick]()

  private def automatonFor(terms: Seq[String]): AhoCorasick =
    cache.computeIfAbsent(terms, t => new AhoCorasick(t.toArray))

  /** Shared eval/codegen kernel (static module call from codegen). */
  def compute(text: UTF8String, terms: Seq[String]): InternalRow = {
    val (hits, distinct) = automatonFor(terms).run(text.toString)
    new GenericInternalRow(Array[Any](hits, distinct.toLong))
  }

  /** `multi_match_stats(text, terms)` as a Column over a string column →
    * `struct<n_hits, n_terms>`. */
  def multi_match_stats(text: Column, terms: Seq[String]): Column = {
    import org.apache.spark.sql.graft.shim
    shim.column(MultiMatchStats(shim.expression(text), terms))
  }
}

/** Classic Aho–Corasick: trie + BFS failure links + per-node MERGED
  * output lists (own dict id ++ outputs of the failure target), so the
  * match loop never walks suffix chains — total occurrence counting is
  * `out(state).length` per consumed character. Distinct terms are
  * tracked in a per-row BitSet over dict ids. Transitions are per-node
  * char hash maps (the dictionary alphabet is unbounded unicode);
  * lookup misses walk the failure chain, the standard time/space trade
  * for sparse alphabets. */
final class AhoCorasick(terms: Array[String]) {
  import scala.collection.mutable

  val nTerms: Int = terms.length

  private val next = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
  private val ownId = mutable.ArrayBuffer(-1)
  // build the trie
  for (id <- terms.indices) {
    var s = 0
    terms(id).foreach { c =>
      s = next(s).getOrElseUpdate(c, {
        next += mutable.HashMap.empty[Char, Int]
        ownId += -1
        next.length - 1
      })
    }
    ownId(s) = id
  }
  private val fail = new Array[Int](next.length)
  private val out = new Array[Array[Int]](next.length)
  // BFS: failure links + merged outputs
  locally {
    val queue = mutable.Queue.empty[Int]
    out(0) = if (ownId(0) >= 0) Array(ownId(0)) else Array.emptyIntArray
    next(0).valuesIterator.foreach { s =>
      fail(s) = 0
      out(s) = if (ownId(s) >= 0) Array(ownId(s)) else Array.emptyIntArray
      queue.enqueue(s)
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      next(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        fail(v) = next(f).get(c).filter(_ != v).getOrElse(0)
        out(v) =
          if (ownId(v) >= 0) ownId(v) +: out(fail(v)) else out(fail(v))
        queue.enqueue(v)
      }
    }
  }

  /** (total occurrences, distinct dict terms) in `s`. */
  def run(s: String): (Long, Int) = {
    var state = 0
    var total = 0L
    val seen = new java.util.BitSet(nTerms)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      var st = state
      while (st != 0 && !next(st).contains(c)) st = fail(st)
      state = next(st).getOrElse(c, 0)
      val ids = out(state)
      if (ids.length > 0) {
        total += ids.length
        var j = 0
        while (j < ids.length) { seen.set(ids(j)); j += 1 }
      }
      i += 1
    }
    (total, seen.cardinality())
  }
}
