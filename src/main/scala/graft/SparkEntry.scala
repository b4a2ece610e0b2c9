package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the tier A/B relational inventory
  * ([[graft.queries.Core]]) and the tier C LLM-data-pipeline operators
  * ([[graft.queries.Pipeline]]); `oracleSql` carries the DuckDB-equivalent
  * SQL for every query that is SQL-expressible (the rest get the driver's
  * rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("wordcount")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Core.queries ++ graft.queries.Pipeline.queries ++
      graft.queries.Relational.queries ++ graft.queries.Analytics.queries ++
      graft.queries.Curation.queries ++ graft.queries.Journey.queries ++
      graft.queries.Quality.queries ++ graft.queries.Graph.queries ++
      graft.queries.Insights.queries ++ graft.queries.Ingest.queries ++
      graft.queries.Web.queries ++ graft.queries.Safety.queries ++
      graft.queries.Preference.queries ++ graft.queries.Dialogue.queries ++
      graft.queries.Eval.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Core.oracleSql ++ graft.queries.Pipeline.oracleSql ++
      graft.queries.Relational.oracleSql ++ graft.queries.Analytics.oracleSql ++
      graft.queries.Curation.oracleSql ++ graft.queries.Journey.oracleSql ++
      graft.queries.Quality.oracleSql ++ graft.queries.Graph.oracleSql ++
      graft.queries.Insights.oracleSql ++ graft.queries.Ingest.oracleSql ++
      graft.queries.Web.oracleSql ++ graft.queries.Safety.oracleSql ++
      graft.queries.Preference.oracleSql ++ graft.queries.Dialogue.oracleSql ++
      graft.queries.Eval.oracleSql
}
