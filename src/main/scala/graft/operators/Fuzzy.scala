package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Query
import graft.sources.Tables

/** Edit-distance similarity join — the record-linkage primitive (find
  * all pairs of names/titles within Levenshtein distance k) built so
  * that no all-pairs product ever forms.
  *
  * Candidate generation is the symmetric-deletion scheme (SymSpell;
  * also FastSS, Bocek et al. 2007): every string emits its deletion
  * neighborhood — all variants obtainable by deleting at most k
  * characters. If lev(a, b) <= k then a and b share at least one
  * common deletion variant (delete from each side the positions the
  * optimal alignment edits), so an EQUI-join on the variant recovers a
  * SUPERSET of all true pairs; candidates are then verified with the
  * real `levenshtein` (codegen'd built-in) and kept only when
  * dist <= k. Lossless by construction — the brute-force oracle is the
  * proof.
  *
  * Scale shape: a string of length L emits O(L^k) variants (L+1 at
  * k=1) — map-only generation via `transform`/`sequence`, no UDF. The
  * join is a plain equi-shuffle on the variant value, partitionable at
  * any scale; the quadratic blowup of a naive theta-join never
  * appears. Verification (levenshtein, the expensive O(L²) DP) runs on
  * candidate pairs only, and a `length`-difference band plus the
  * id_a < id_b half-plane cut precede it as cheap predicates. A pair
  * sharing several variants surfaces several times, so the verified
  * match set is de-duplicated with one `distinct` — a shuffle over
  * MATCHES (tiny), never over candidates or the corpus.
  *
  * Unit contract: variants delete UTF-16 positions via `substring`
  * composition while Spark's `levenshtein` counts code points; both
  * agree on BMP text, and the catalog entry joins ASCII names. (The
  * engine-wide code-point contract is documented at [[Bpe]].)
  */
object Fuzzy {

  /** All strings obtainable from `s` by deleting at most one
    * character: the string itself plus its L single-deletion variants,
    * as an array column (distinct — "aa" deletes to one "a"). */
  private def deleteOne(s: Column): Column =
    array_distinct(concat(
      array(s),
      transform(sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))))))

  /** Deletion neighborhood of `s` up to depth k (k in {1, 2}): every
    * variant reachable by deleting at most k characters. k=2 composes
    * deleteOne over the k=1 layer and flattens — O(L²) variants. */
  private def deletionNeighborhood(s: Column, k: Int): Column = {
    require(k == 1 || k == 2, s"supported k: 1 or 2, got $k")
    if (k == 1) deleteOne(s)
    else array_distinct(flatten(transform(deleteOne(s), v => deleteOne(v))))
  }

  /** All pairs of `df` rows (columns: id, name) with
    * levenshtein(name_a, name_b) <= k, id_a < id_b, each pair exactly
    * once, with the distance: (id_a, id_b, name_a, name_b, dist).
    *
    * Round-17 shape (same output, measured 7.4 s → see
    * OPTIMIZATION_r17.md): the candidate join runs on HASHES of the
    * deletion variants, not the variant strings — xxhash64 collisions
    * can only ADD candidates (superset), never drop a true pair, and
    * every candidate is verified with the exact `levenshtein` below,
    * so the match set is unchanged (guide §2.3: shuffle 8-byte keys,
    * not payload strings). Candidate (id, id) pairs are DEDUPLICATED
    * BEFORE verification — a pair sharing v variants previously paid
    * the O(L²) levenshtein v times and shipped both name strings v
    * times through the exchange; now the verify runs once per distinct
    * pair, with the names re-attached by a join against the (tiny
    * compared to the candidate stream) name table. The length band
    * rides the variant rows as a cheap pre-filter, as before. */
  def editJoin(df: DataFrame, k: Int): DataFrame = {
    // The candidate and verify stages are CPU-heavy per byte (the
    // candidate stream is ~4× the corpus and every candidate pays an
    // O(L²) levenshtein), but their rows are 16-24 bytes — AQE's
    // byte-based coalescing squeezed them onto 1-3 tasks (measured:
    // the join+dedup stage ran as ONE 1.2 s task and the verify as 3,
    // ~10 s of single-threaded work on a 32-core box). The explicit
    // partition counts below pin those exchanges at the session's
    // shuffle parallelism — a conf-derived value (3× cores locally,
    // cluster-sized in production), never a constant — which AQE does
    // not coalesce. Same rows, same results; the exchanges now match
    // the stage's CPU shape instead of its byte count.
    val np = df.sparkSession.sessionState.conf.numShufflePartitions
    val variants = df.select(col("id"), length(col("name")).as("len"),
      explode(deletionNeighborhood(col("name"), k)).as("v"))
      .select(col("id"), col("len"), xxhash64(col("v")).as("vh"))
      .repartition(np, col("vh"))
    val a = variants.alias("a")
    val b = variants.alias("b")
    val cand = a.join(b,
        col("a.vh") === col("b.vh") &&
        col("a.id") < col("b.id") &&
        abs(col("a.len") - col("b.len")) <= k)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val names = df.select(col("id"), col("name"))
    cand
      .join(names.select(col("id").as("id_a"), col("name").as("name_a")), "id_a")
      .join(names.select(col("id").as("id_b"), col("name").as("name_b")), "id_b")
      // THRESHOLD levenshtein (3-arg form): a banded O(k·L) DP with
      // early exit instead of the full O(L²) table — it returns the
      // exact distance when ≤ k and -1 otherwise, so the filter and
      // the emitted distance are value-identical to the 2-arg form on
      // every kept row. The dedup of pairs that share several variants
      // runs AFTER verification, over the match set (the measured dup
      // factor on candidates is ~2%, so verifying per occurrence is
      // cheaper than a pre-verify distinct exchange of the candidate
      // stream — and at scale it removes one candidate-sized shuffle).
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b"), k).as("dist"))
      .filter(col("dist") >= 0 && col("dist") <= k)
      // dedup on the id pair: names and dist are functions of the ids,
      // so this keeps exactly one copy of each identical match row (as
      // the former all-column distinct did) while letting a caller
      // that drops the name columns prune them out of the exchange
      .dropDuplicates("id_a", "id_b")
  }

  val queries: Seq[Query] = Seq(
    Query(
      "q111_edit_join",
      "Edit-distance similarity join (record linkage): all customer-name " +
        "pairs within Levenshtein distance 1, via symmetric-deletion " +
        "(SymSpell) candidate generation — map-only O(L) deletion variants " +
        "per name, an equi-join on the shared variant (never an all-pairs " +
        "theta join), levenshtein verification on candidates only, and a " +
        "distinct over the match set. Lossless candidates; the oracle is " +
        "DuckDB's brute-force levenshtein join.",
      (s, dir) => {
        val names = Tables.customer(s, dir)
          .select(col("c_custkey").as("id"), col("c_name").as("name"))
        editJoin(names, k = 1)
          .select(col("id_a").as("cust_a"), col("id_b").as("cust_b"), col("dist"))
          .orderBy("cust_a", "cust_b")
      },
      Some("""
        SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
               CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
        FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 1
        ORDER BY cust_a, cust_b"""))
  )
}
