package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions._

/** `SparkSessionExtensions` wiring: registers the engine's native
  * Catalyst expressions as SQL functions, so `spark.sql("SELECT
  * minhash_signature(hs, 128) …")` works exactly like the Column API —
  * the registration path any BI/SQL-only consumer of the library uses.
  *
  * Enable with `spark.sql.extensions=graft.GraftExtensions` (set by
  * [[GraftSession]]) or pass to `SparkSession.builder.withExtensions`.
  *
  * Shape arguments (k, n, tables, bits, dim) are part of the
  * expression's STRUCTURE (they size generated code and plane
  * matrices), so they must be foldable integer literals — enforced
  * here with a clear error instead of a ClassCastException inside
  * planning. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(fn: String, which: String, e: Expression): Int = e match {
    case lit: Literal if lit.dataType == IntegerType && lit.value != null =>
      lit.value.asInstanceOf[Int]
    case other => throw new IllegalArgumentException(
      s"$fn: $which must be an integer literal, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(hashes, k) - k-slot MinHash signature of an array<bigint>"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "minhash_signature(hashes, k)")
        MinHashSignature(args.head, intArg("minhash_signature", "k", args(1)))
      }))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(hashes) - 64-bit SimHash of an array<bigint>"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash64(hashes)")
        SimHash64(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("ngram_xxhash64"),
      info("ngram_xxhash64", "ngram_xxhash64(tokens, n) - chained xxhash64 per word n-gram"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "ngram_xxhash64(tokens, n)")
        NgramXxHash64(args.head, intArg("ngram_xxhash64", "n", args(1)))
      }))
    ext.injectFunction((FunctionIdentifier("srp_signatures"),
      info("srp_signatures", "srp_signatures(emb, tables, bits, dim) - packed sign-random-projection signatures"),
      (args: Seq[Expression]) => {
        require(args.length == 4, "srp_signatures(emb, tables, bits, dim)")
        SrpSignatures(args.head,
          intArg("srp_signatures", "tables", args(1)),
          intArg("srp_signatures", "bits", args(2)),
          intArg("srp_signatures", "dim", args(3)))
      }))
    ext.injectFunction((FunctionIdentifier("vector_dot"),
      info("vector_dot", "vector_dot(a, b) - dot product of two array<double>"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vector_dot(a, b)")
        VectorDot(args.head, args(1))
      }))
    ext.injectFunction((FunctionIdentifier("bottomk_ngram_md5"),
      info("bottomk_ngram_md5", "bottomk_ngram_md5(tokens, n, k) - bottom-k md5 n-gram fingerprint struct"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "bottomk_ngram_md5(tokens, n, k)")
        BottomKNgramMd5(args.head,
          intArg("bottomk_ngram_md5", "n", args(1)),
          intArg("bottomk_ngram_md5", "k", args(2)))
      }))
    ext.injectFunction((FunctionIdentifier("repetition_stats"),
      info("repetition_stats", "repetition_stats(tokens) - per-doc repetition signal struct"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "repetition_stats(tokens)")
        RepetitionStats(args.head)
      }))
    // aggregate function: the analyzer wraps a bare AggregateFunction in
    // an AggregateExpression itself, same as built-in registry entries
    ext.injectFunction((FunctionIdentifier("frequent_items"),
      info("frequent_items", "frequent_items(item, k) - Misra-Gries top items as array<struct<item,count>>"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "frequent_items(item, k)")
        FrequentItemsSketch(args.head, intArg("frequent_items", "k", args(1)))
      }))
  }
}
