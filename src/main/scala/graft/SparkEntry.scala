package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.cluster.ClusterQueries
import graft.dedup.DedupQueries
import graft.events.EventsQueries
import graft.keyspace.KeyspaceQueries
import graft.multimodal.Multimodal
import graft.relational.RelationalQueries
import graft.sim.SimilarityQueries
import graft.text.TextQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one named entry per implemented operator from
  * SURVEY.md §2 (plus the training-data-pipeline extensions); `oracleSql`
  * carries the DuckDB-equivalent statement for every oracle-checkable query.
  * Column names and row ordering are aligned pairwise — the driver's compare
  * hashes values after sorting columns by name.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A point GET through the full derive→compact→route path (O1). */
  def entry(spark: SparkSession): DataFrame =
    KeyspaceQueries.queries("kv_point_get")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    KeyspaceQueries.queries ++ ClusterQueries.queries ++
      TextQueries.queries ++ graft.text.PipelineQueries.queries ++
      DedupQueries.queries ++
      graft.dedup.DedupComponents.queries ++
      graft.graph.GraphXAnalytics.queries ++
      graft.relational.AsOfQueries.queries ++
      SimilarityQueries.queries ++ Multimodal.queries ++
      EventsQueries.queries ++ EventsQueries.moreQueries ++
      RelationalQueries.queries ++
      graft.relational.RangeJoinQueries.queries ++
      graft.relational.PageRank.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    KeyspaceQueries.oracle ++ ClusterQueries.oracle ++
      TextQueries.oracle ++ graft.text.PipelineQueries.oracle ++
      DedupQueries.oracle ++
      graft.dedup.DedupComponents.oracle ++
      graft.graph.GraphXAnalytics.oracle ++
      graft.relational.AsOfQueries.oracle ++
      SimilarityQueries.oracle ++ Multimodal.oracle ++
      EventsQueries.oracle ++ EventsQueries.moreOracle ++
      RelationalQueries.oracle ++
      graft.relational.RangeJoinQueries.oracle ++
      graft.relational.PageRank.oracle
}
