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

  /** First 8 hex chars of md5(key) as an integer — uniform over [0, 2^32),
    * the numeric twin of [[hashBucket]] for priority arithmetic. */
  def hashU32(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")

  /** Deterministic weighted sampling without replacement, `k` rows per
    * `group`: sequential Poisson / priority sampling (Ohlsson 1998;
    * Duffield–Lund–Thorup 2007) with the uniform drawn from md5(key)
    * instead of an RNG — content-stable across runs, engines, and
    * partitionings, like [[deterministicSample]].
    *
    * Priority = u32(key) / weight: higher-weight rows draw smaller
    * priorities and the k smallest per group win. Both operands convert
    * exactly to double and IEEE division is exactly rounded, so the
    * priority — and therefore the selected set — is bit-identical in any
    * IEEE engine (the DuckDB oracle evaluates the same expression).
    *
    * Selection reuses [[Skew.groupQuota]]'s salted tournament, so a hot
    * group spreads over `nSalts` tasks instead of one whole-group
    * window partition. Rows with non-positive weight are excluded (a
    * zero weight would make the priority infinite — semantically "never
    * sample", so dropping them is the correct limit). */
  def weightedSample(df: DataFrame, group: Column, key: Column,
      weight: Column, k: Int, nSalts: Int = 8): DataFrame =
    Skew.groupQuota(
      df.filter(weight > 0)
        .withColumn("__pri", hashU32(key).cast("double") / weight),
      group, Seq(col("__pri"), key), k, nSalts)
      .drop("__pri")

  /** Temperature-scaled mixture sampling (the multilingual-pretraining
    * rebalance, Conneau & Lample 2019 §3.1 with α = 1/2): per-group
    * sample quotas proportional to n^α flatten the size distribution so
    * head groups stop drowning tail groups, then each group contributes
    * its quota of deterministically-chosen documents.
    *
    * Integer-exact end to end so the oracle can hash-compare: the
    * weight is `isqrt(n) = floor(sqrt(n))` — `sqrt` is IEEE
    * correctly-rounded in both engines and `floor(sqrt(n)) == isqrt(n)`
    * exactly for n < 2^51 — and the quota is the integer division
    * `total * w // Σw` (Σ over integers is order-independent, unlike a
    * double Σ n^α, which is why α is pinned to 1/2 rather than a free
    * parameter). Selection within a group is smallest-`md5(doc_id)`
    * first — content-stable like every sampler here.
    *
    * Scale shape: quotas come from one group-count aggregate joined
    * back (broadcast Σw via the q46 bounds pattern, no driver
    * round-trip); the per-group pick uses the q43 salted tournament
    * with a per-ROW quota column, so no corpus-sized group ever meets a
    * bare single-task window — stage 2 sees ≤ nSalts · quota rows per
    * group, bounded by the requested sample size. */
  def temperatureMix(docs: DataFrame, group: Column, key: Column,
      total: Long, nSalts: Int = 8): DataFrame = {
    val g = docs.groupBy(group.as("__g")).agg(count(lit(1)).as("__n"))
      .withColumn("__w", floor(sqrt(col("__n").cast("double"))).cast("long"))
    val sumW = g.agg(sum("__w").as("__sw"))
    val quotas = g.crossJoin(broadcast(sumW))
      // integral end to end: BIGINT multiply + `div` matches the
      // oracle's `//` exactly at ANY magnitude (both operands are
      // non-negative, so floor == truncate). The former double-division
      // floor was exact only while total * w stayed under 2^53 — nothing
      // enforced that, so a huge corpus could silently diverge from the
      // oracle; now the one remaining failure mode (64-bit multiply
      // overflow, which would wrap silently under non-ANSI semantics)
      // raises instead.
      .withColumn("target",
        // the guard itself must be integral: Column `/` is DOUBLE
        // division, whose rounding near the boundary both misses real
        // overflows (threshold rounds up past the true floor) and
        // raises on safe inputs (threshold rounds down) — `div` is the
        // exact floor for the non-negative operands here
        when(col("__w") > 0 &&
            lit(total) > expr(s"${Long.MaxValue}L div __w"),
          raise_error(concat(lit(s"temperatureMix: total=$total * weight="),
            col("__w"), lit(" overflows BIGINT"))))
          .otherwise(expr(s"(${total}L * __w) div __sw")))
      .select(col("__g"), col("target"))
    // q43's salted tournament with the per-row quota column (the quota
    // is group-constant by construction — joined from `quotas` — which
    // is groupTopKVar's soundness precondition)
    Skew.groupTopKVar(
      docs.join(quotas, group === col("__g"))
        .withColumn("__pickkey", md5(key.cast("string"))),
      col("__g"), Seq(col("__pickkey").asc, key.asc),
      Seq(col("__pickkey"), key), col("target"), nSalts)
      .withColumnRenamed("rk", "pick")
      .drop("__g", "__pickkey")
  }


  /** Leakage-safe train/valid/test split: the split key is the document's
    * NEAR-DUP CLUSTER id (its q40 connected-component root; itself when
    * unclustered), so a document and all its near-duplicates land in the
    * SAME split by construction. Splitting on `doc_id` alone leaks
    * evaluation data: a test document whose near-duplicate sits in train
    * is effectively memorized-by-proxy — the classic benchmark-
    * contamination path that survives exact dedup. Same content-stable
    * md5 mechanics as [[splitColumn]], applied to the cluster id.
    *
    * Shape: one doc-keyed left join of the (bounded, ids-only) cluster
    * frame + a map-side hash projection — the clustering itself is
    * [[DupClusters.connectedComponents]]'s verified O(log² n) plan. */
  def leakageSafeSplit(docs: DataFrame, clusters: DataFrame,
      train: Double, valid: Double): DataFrame =
    docs.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .select(col("doc_id"), col("cluster_id"),
        splitColumn(col("cluster_id"), train, valid).as("split"))

  /** Exact-quota stratified sample: exactly min(quota, |stratum|) rows
    * per stratum, chosen by the md5-of-key order — the eval-set
    * construction primitive. The existing samplers are PROPORTIONAL
    * (hash-threshold q35/q44 drift ±O(√n) per stratum; weighted q47
    * draws by priority): an eval set needs exact per-stratum counts,
    * which means a per-stratum rank, and at 100 TB a bare per-stratum
    * window is the q31 single-task pathology — so the rank runs on the
    * q43 salted tournament ([[Skew.groupTopK]]): per-(stratum, salt)
    * top-quota first, then the ≤ nSalts·quota survivors. Hash order
    * (not physical order) makes the sample reproducible under any
    * repartition/relayout, and (hash, key) is a total order so the
    * result is engine-exact — the DuckDB oracle runs the naive window
    * the operator refuses to. */
  def stratifiedQuota(df: DataFrame, stratum: Column, key: Column,
      quota: Int): DataFrame =
    Skew.groupTopK(
      df.withColumn("__h", md5(key.cast("string").cast("binary"))),
      stratum, Seq(col("__h").asc, key.asc),
      Seq(col("__h"), key), n = quota, nSalts = 8)
      .drop("__h")

  /** Root of the staged IVF index the last [[diversitySample]] run
    * sampled from — late-bound into the oracle SQL (the q110
    * staged-root thunk convention). */
  @volatile private[graft] var diversityOracleRoot: Option[String] = None

  /** CLUSTER-BALANCED diversity sampling (the D4-style selection
    * stage, Tirumala et al. 2023): embed → cluster → take an equal
    * per-cluster quota, so the sample spans the corpus's semantic
    * modes instead of letting the head topics dominate — the
    * diversity half of the curation story whose dedup half is
    * SemDeDup (q80). Reuses the persisted IVF coarse quantizer
    * (q77's staged, deterministic Lloyd fit) as the cluster
    * structure: the inverted lists ARE the clusters, so selection is
    * one scan of the staged lists + the q119 exact-quota machinery
    * (md5-of-key rank on the salted tournament — reproducible under
    * any relayout, never a bare corpus-wide window), plus one
    * broadcast join against the C-row centroid table to emit each
    * pick's centroid similarity (the per-cluster representativeness
    * signal a mixture builder thresholds on). Output bounded by
    * C·quota rows at any corpus size. */
  def diversitySample(spark: org.apache.spark.sql.SparkSession,
      dir: String, perCluster: Int = 4, centroids: Int = 64): DataFrame = {
    val idx = AnnIndex.ivfIndex(spark, dir, centroids)
    diversityOracleRoot = Some(Staging.abs(idx))
    val lists = spark.read.parquet(s"$idx/lists")
      .select(col("cluster").cast("int").as("cluster"), col("vec_id"),
        col("emb"), col("nrm"))
    val cent = spark.read.parquet(s"$idx/centroids")
    Skew.groupTopK(
        lists.withColumn("__h",
          md5(col("vec_id").cast("string").cast("binary"))),
        col("cluster"), Seq(col("__h").asc, col("vec_id").asc),
        Seq(col("__h"), col("vec_id")), n = perCluster, nSalts = 8)
      .join(broadcast(cent), col("cluster") === col("cent_id"))
      .select(col("cluster"), col("vec_id"), col("rk").cast("int").as("pick"),
        Similarity.cosine(col("emb"), col("nrm"), col("c_emb"),
          col("c_nrm")).as("cent_sim"))
      .orderBy("cluster", "pick")
  }

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
    ,
    Query(
      "q47_weighted_sample",
      "Deterministic weighted sampling, 5 docs per source weighted by " +
        "n_chars: sequential Poisson / priority sampling with the uniform " +
        "drawn from md5(doc_id) — content-stable across runs, engines, and " +
        "partitionings. Priority u32/weight is IEEE-exact in both engines, " +
        "and selection runs the q43 salted tournament so a hot source never " +
        "funnels through one window task. Oracle: the same priority ranked " +
        "by one naive window in DuckDB.",
      (s, dir) =>
        weightedSample(Tables.documents(s, dir).select("source", "doc_id", "n_chars"),
            col("source"), col("doc_id"), col("n_chars"), k = 5)
          .select(col("source"), col("doc_id"), col("n_chars"),
            col("rk").cast("int").as("rk"))
          .orderBy("source", "doc_id"),
      Some("""
        WITH ranked AS (
          SELECT source, doc_id, n_chars,
                 CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE) / n_chars,
                            doc_id) AS INT) AS rk
          FROM documents WHERE n_chars > 0)
        SELECT source, doc_id, n_chars, rk
        FROM ranked WHERE rk <= 5
        ORDER BY source, doc_id""")),

    Query(
      "q86_temperature_mix",
      "Temperature-scaled mixture sampling (α = 1/2): per-language quotas " +
        "∝ isqrt(n_docs), normalized to a 200-doc budget by integer " +
        "division, filled with the smallest-md5(doc_id) documents of each " +
        "language via the q43 salted tournament (per-row quota column — " +
        "no corpus-sized bare window). Integer-exact throughout: " +
        "floor(sqrt(n)) and total*w//Σw are engine-identical, so the " +
        "oracle hash-compares the full selection.",
      (s, dir) =>
        temperatureMix(
          Tables.documents(s, dir).select("lang", "doc_id"),
          col("lang"), col("doc_id"), total = 200L)
          .select(col("lang"), col("doc_id"), col("pick"), col("target"))
          .orderBy("lang", "pick"),
      Some("""
        WITH g AS (
          SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
        ), w AS (
          SELECT lang, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w FROM g
        ), t AS (
          SELECT lang, CAST((200 * w) // (SELECT SUM(w) FROM w) AS BIGINT) AS target
          FROM w
        ), ranked AS (
          SELECT d.lang, d.doc_id, t.target,
                 CAST(row_number() OVER (
                   PARTITION BY d.lang
                   ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS INT) AS pick
          FROM documents d JOIN t USING (lang))
        SELECT lang, doc_id, pick, target
        FROM ranked WHERE pick <= target
        ORDER BY lang, pick""")),

    Query(
      "q98_leakage_split",
      "Leakage-safe 80/10/10 split: split key = the q40 near-dup cluster " +
        "root (itself when unclustered), so a document and ALL its " +
        "near-duplicates land in the same split — closing the eval-" +
        "contamination path a doc_id-keyed split (q35) leaves open (a " +
        "test doc's near-twin in train = memorization by proxy). " +
        "Composes q28 pairs -> q40 components -> md5 split under ONE " +
        "oracle (recursive-CTE closure + the same hex-threshold " +
        "predicate in DuckDB). The ScalaTest side proves the property " +
        "itself: no q28 pair straddles splits, while the naive doc-" +
        "keyed split demonstrably does on a crafted twin.",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        // cluster frame from the shared fingerprinted parquet stage
        // (q28 pairs -> q40 components, write-once per source content;
        // also serves q100) — the oracle's recursive-CTE closure still
        // gates the full composition, because the stage is that chain
        leakageSafeSplit(docs,
            TrainingPipeline.nearDupClustersStaged(s, dir), 0.8, 0.1)
          .orderBy("doc_id")
      },
      Some("""
        WITH RECURSIVE sh AS (
          SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(ws) - 1),
                                         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
          FROM (SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
                FROM documents)
        ), sz AS (
          SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
        ), inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ), edges AS (
          SELECT doc_a, doc_b FROM inter
          JOIN sz za ON za.doc_id = doc_a
          JOIN sz zb ON zb.doc_id = doc_b
          WHERE CAST(i AS DOUBLE) / CAST(za.n + zb.n - i AS DOUBLE) >= 0.7
        ), bi AS (
          SELECT doc_a AS u, doc_b AS v FROM edges
          UNION
          SELECT doc_b AS u, doc_a AS v FROM edges
        ), reach(u, v) AS (
          SELECT u, v FROM bi
          UNION
          SELECT r.u, b.v FROM reach r JOIN bi b ON r.v = b.u WHERE b.v <> r.u
        ), cl AS (
          SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id
          FROM reach GROUP BY u
        )
        SELECT d.doc_id,
               COALESCE(cl.cluster_id, d.doc_id) AS cluster_id,
               CASE WHEN substring(md5(CAST(COALESCE(cl.cluster_id, d.doc_id) AS VARCHAR)), 1, 8) < 'cccccccc' THEN 'train'
                    WHEN substring(md5(CAST(COALESCE(cl.cluster_id, d.doc_id) AS VARCHAR)), 1, 8) < 'e6666666' THEN 'valid'
                    ELSE 'test' END AS split
        FROM documents d LEFT JOIN cl USING (doc_id)
        ORDER BY d.doc_id"""))
    ,
    Query(
      "q119_stratified_quota",
      "Exact-quota stratified sampling (the eval-set primitive): exactly " +
        "min(10, |stratum|) documents per language, in md5(doc_id) order " +
        "— reproducible under any physical relayout, exact counts where " +
        "the proportional hash splits (q35/q44) drift. The per-stratum " +
        "rank runs on the q43 salted tournament, never a bare stratum " +
        "window; the oracle runs the naive row_number the operator " +
        "refuses to, proving identical selection.",
      (s, dir) =>
        stratifiedQuota(Tables.documents(s, dir), col("lang"),
          col("doc_id"), quota = 10)
          .select(col("lang"), col("rk").cast("int").as("rk"), col("doc_id"))
          .orderBy("lang", "rk"),
      Some("""
        SELECT lang, CAST(rn AS INT) AS rk, doc_id
        FROM (
          SELECT lang, doc_id,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
          FROM documents)
        WHERE rn <= 10
        ORDER BY lang, rk"""))
    ,
    Query(
      "q160_diversity_sample",
      "CLUSTER-BALANCED diversity sampling (the D4-style selection " +
        "stage): embed -> cluster -> equal per-cluster quota, so the " +
        "sample spans the corpus's semantic modes instead of letting " +
        "head topics dominate — the diversity half of the curation " +
        "story whose dedup half is SemDeDup (q80). Reuses the " +
        "persisted IVF coarse quantizer (deterministic staged Lloyd " +
        "fit) as the cluster structure — the inverted lists ARE the " +
        "clusters — so selection is one scan of the staged lists plus " +
        "the q119 exact-quota machinery (md5-of-key rank on the " +
        "salted tournament, reproducible under any relayout, never a " +
        "bare window) and one broadcast join against the C-row " +
        "centroid table for each pick's centroid similarity. Output " +
        "bounded by C*quota rows at any corpus size. ORACLE-gated end " +
        "to end via the staged-root convention: DuckDB re-ranks the " +
        "SAME staged lists with the naive window and recomputes " +
        "cent_sim with list_dot_product — selection, layout, and the " +
        "double-precision similarity all hash-compared cross-engine.",
      (s, dir) => diversitySample(s, dir),
      oracleFn = Some(() => diversityOracleRoot.map(idx => s"""
        WITH l AS (
          SELECT CAST(cluster AS INT) AS cluster, vec_id, emb, nrm
          FROM read_parquet('$idx/lists/*/*.parquet', hive_partitioning=1)
        ),
        c AS (
          SELECT cent_id, c_emb, c_nrm
          FROM read_parquet('$idx/centroids/*.parquet')
        ),
        r AS (
          SELECT cluster, vec_id, emb, nrm,
                 row_number() OVER (PARTITION BY cluster
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
          FROM l)
        SELECT r.cluster, r.vec_id, CAST(r.rn AS INT) AS pick,
               list_dot_product(r.emb, c.c_emb) / (r.nrm * c.c_nrm)
                 AS cent_sim
        FROM r JOIN c ON r.cluster = c.cent_id
        WHERE rn <= 4
        ORDER BY cluster, pick""")))
  )
}
