package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AnnIndex, AsOf, DeletionAudit, Bpe, BloomJoin, Bucketed, Curation, Decontamination, Dedup, Dsir, DupClusters, Eval, Events, Fuzzy, Graph, GraphServe, Intervals, Layout, Logit, Multimodal, NnDescent, Partitioned, Pca, Profiling, Relational, Retrieval, Sampling, SemanticDedup, Shards, Similarity, Skew, SnapshotDiff, SqlFrontDoor, StreamTwins, TextAnalysis, TextIndex, TrainOrder, TrainingPipeline, Unigram, Vocab}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The catalog is assembled from per-area registries ([[graft.Query]]
  * entries): relational parity operators (SURVEY.md §2), and the
  * training-data-pipeline extensions (dedup, similarity, text analysis).
  */
object SparkEntry {

  /** All registered queries, in registration order. */
  def catalog: Seq[Query] =
    Relational.queries ++ TextAnalysis.queries ++ Dedup.queries ++
      Similarity.queries ++ Multimodal.queries ++ Skew.queries ++
      AsOf.queries ++ Curation.queries ++ Sampling.queries ++
      Decontamination.queries ++ DupClusters.queries ++ Shards.queries ++
      Vocab.queries ++ Profiling.queries ++ Intervals.queries ++
      BloomJoin.queries ++ Bucketed.queries ++ Events.queries ++
      SnapshotDiff.queries ++ Partitioned.queries ++ SqlFrontDoor.queries ++
      Layout.queries ++ TrainingPipeline.queries ++ AnnIndex.queries ++
      SemanticDedup.queries ++ TrainOrder.queries ++ TextIndex.queries ++
      Retrieval.queries ++ StreamTwins.queries ++ Bpe.queries ++
      Fuzzy.queries ++ Graph.queries ++ Logit.queries ++ Eval.queries ++
      Dsir.queries ++ Pca.queries ++ Unigram.queries ++ NnDescent.queries ++
      GraphServe.queries ++ DeletionAudit.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The hypercube shape (3-table join + 5-dim GROUP BY + multi-distinct)
    * on the test schema — the reference's entire semantic surface in one
    * declarative plan. */
  def entry(spark: SparkSession): DataFrame =
    queries("q4_hypercube")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    * Late-bound oracles ([[Query.oracleFn]] thunks over staged roots)
    * resolve HERE, at dump time — so this works on any catalog
    * snapshot, taken before or after the entries ran. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracleNow.map(sql => q.name -> sql.stripMargin.trim)).toMap
}
