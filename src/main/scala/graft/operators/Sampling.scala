package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Query
import graft.sources.Tables

/** Deterministic, content-stable sampling and dataset splitting — the
  * reproducibility primitive every training-data pipeline needs: the
  * same document lands in the same split on every run, every engine,
  * and every cluster size, because the "randomness" is a cryptographic
  * hash of the record key, not an RNG (`rand()` would differ per run
  * AND per partitioning; seeded `sample()` differs across engines).
  *
  * Mechanics: the first 8 hex chars of `md5(key)` are uniform over
  * [0, 2^32); comparing them LEXICOGRAPHICALLY against a fixed-width
  * hex threshold is an exact integer compare (same-length lowercase hex
  * preserves numeric order), so the split predicate is a pure string
  * expression any SQL engine evaluates identically — which is exactly
  * what the DuckDB oracle checks. Map-only, no shuffle, trivially
  * parallel at any scale. */
object Sampling {

  /** First 8 hex chars of md5(key) — uniform over 2^32 values. */
  def hashBucket(key: Column): Column =
    substring(md5(key.cast("string")), 1, 8)

  /** Threshold constant: `floor(f * 2^32)` as 8 lowercase hex chars. */
  def hexThreshold(f: Double): String = {
    require(f >= 0.0 && f <= 1.0, s"fraction out of range: $f")
    f"${(f * 4294967296.0).toLong.min(0xFFFFFFFFL)}%08x"
  }

  /** Deterministic Bernoulli sample: keeps rows whose key hashes below
    * the fraction threshold. */
  def deterministicSample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.filter(hashBucket(key) < lit(hexThreshold(fraction)))

  /** Content-stable train/valid/test assignment with the given train and
    * valid fractions (test takes the rest). */
  def splitColumn(key: Column, train: Double, valid: Double): Column =
    when(hashBucket(key) < lit(hexThreshold(train)), "train")
      .when(hashBucket(key) < lit(hexThreshold(train + valid)), "valid")
      .otherwise("test")

  val queries: Seq[Query] = Seq(
    Query(
      "q35_split",
      "Deterministic 80/10/10 train/valid/test split keyed on md5(doc_id) — " +
        "content-stable across runs, engines, and partitionings (an RNG-based " +
        "split is neither). Counted per (lang, split); the oracle evaluates the " +
        "identical hash predicate in DuckDB, so assignment parity is exact.",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("lang"), splitColumn(col("doc_id"), 0.8, 0.1).as("split"))
          .groupBy("lang", "split")
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("lang", "split"),
      Some("""
        SELECT lang,
               CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc' THEN 'train'
                    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666' THEN 'valid'
                    ELSE 'test' END AS split,
               COUNT(*) AS n_docs
        FROM documents
        GROUP BY 1, 2
        ORDER BY lang, split"""))
    ,
    Query(
      "q44_mixture_manifest",
      "Data-mixture manifest: document and token totals per (split, source) — " +
        "the accounting table a pre-train run publishes so mixture weights and " +
        "epoch math are auditable. Content-stable split assignment (q35) plus " +
        "one map-side-combining aggregate over (split, source); tokens counted " +
        "with the split-based tokenizer so the SQL twin is exact.",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("source"), splitColumn(col("doc_id"), 0.8, 0.1).as("split"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
          .groupBy("split", "source")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
          .orderBy("split", "source"),
      Some("""
        SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc' THEN 'train'
                    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666' THEN 'valid'
                    ELSE 'test' END AS split,
               source,
               COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))) AS BIGINT) AS n_tokens
        FROM documents
        GROUP BY 1, 2
        ORDER BY split, source"""))
  )
}
