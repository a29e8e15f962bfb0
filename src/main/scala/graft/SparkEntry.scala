package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the query/oracle registries of every engine module:
  *  - [[graft.relational.RelationalQueries]] — relational capability
  *    (joins/aggs/windows/set-ops/top-k/sessionize) over the harness tables.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The batch twin of the reference's consume→route→count pipeline. */
  def entry(spark: SparkSession): DataFrame =
    queries("q16_route_count")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    relational.RelationalQueries.queries ++
      ext.TextAnalysis.queries ++
      ext.Dedup.queries ++
      ext.Similarity.queries ++
      ext.Multimodal.queries ++
      ext.Curation.queries ++
      ext.Graph.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    relational.RelationalQueries.oracle ++
      ext.TextAnalysis.oracle ++
      ext.Dedup.oracle ++
      ext.Similarity.oracle ++
      ext.Multimodal.oracle ++
      ext.Curation.oracle ++
      ext.Graph.oracle
}
