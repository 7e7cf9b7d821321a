package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every operator module's (query, oracle) registry.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.salesRollup(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++ operators.Core.queries ++
      operators.LotPipeline.queries ++ operators.LoadOps.queries ++
      operators.WindowOps.queries ++ operators.TextOps.queries ++
      operators.Dedup.queries ++ operators.Similarity.queries ++
      operators.Multimodal.queries ++ operators.Rollups.queries ++
      operators.Sessionize.queries ++ operators.AsofOps.queries ++
      operators.CorpusFilter.queries ++ operators.ScaleOps.queries ++
      operators.Formats.queries ++ operators.CorpusOps.queries ++
      operators.EventOps.queries ++ operators.TrainOps.queries ++
      operators.QualityOps.queries ++ operators.Curation.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++ operators.Core.oracles ++
      operators.LotPipeline.oracles ++ operators.LoadOps.oracles ++
      operators.WindowOps.oracles ++ operators.TextOps.oracles ++
      operators.Dedup.oracles ++ operators.Similarity.oracles ++
      operators.Multimodal.oracles ++ operators.Rollups.oracles ++
      operators.Sessionize.oracles ++ operators.AsofOps.oracles ++
      operators.CorpusFilter.oracles ++ operators.ScaleOps.oracles ++
      operators.Formats.oracles ++ operators.CorpusOps.oracles ++
      operators.EventOps.oracles ++ operators.TrainOps.oracles ++
      operators.QualityOps.oracles ++ operators.Curation.oracles
}
