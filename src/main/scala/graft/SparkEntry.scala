package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every registered operator (SURVEY.md §2) from the module
  * registries. Each entry pairs a Spark implementation with, where
  * SQL-expressible, a DuckDB oracle over the same parquet tables.
  */
object SparkEntry {

  private def registry: Seq[Q] =
    operators.Relational.all ++ operators.Analytics.all ++
      operators.EventTime.all ++ operators.SkewTools.all ++
      operators.TextOps.all ++ operators.Bpe.all ++ operators.Perplexity.all ++
      operators.Word2Vec.all ++
      operators.Classify.all ++
      operators.Features.all ++ operators.Recommender.all ++
      operators.Regression.all ++ operators.Trees.all ++
      operators.Matrices.all ++
      operators.Topics.all ++ operators.Patterns.all ++
      operators.Similarity.all ++
      operators.Clusters.all ++ operators.Bucketed.all ++
      operators.Embeddings.all ++ operators.PCA.all ++
      operators.SemanticDedup.all ++
      operators.Graphs.all ++
      operators.Multimodal.all ++ operators.Stats.all ++
      operators.Evaluation.all ++ sources.RandomData.all ++
      ml.Optimize.all ++ operators.Sketches.all ++ operators.Layout.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q01.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Production-only twins for the certificate-carrying entries: the
    * same operator WITHOUT its oracle-certificate columns (exact
    * recounts, in-plan re-derivations, per-iteration measured claims).
    * Bench times these alongside the gated plans and reports them as
    * `t_prod`, so throughput can be read against production plans
    * directly. */
  def prodQueries: Map[String, (SparkSession, String) => DataFrame] =
    registry.flatMap(q => q.prod.map(q.name -> _)).toMap
}
