package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{MultimodalQueries, PipelineQueries, RelationalQueries, TextQueries, TpchCatalogQueries, TpchQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator module's entries; `oracleSql`
  * carries the DuckDB-equivalent SQL for each oracle-checkable query
  * (rows-only checks for the rest).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q05_nation_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ TextQueries.queries ++ PipelineQueries.queries ++
      VectorQueries.queries ++ TpchQueries.queries ++ TpchCatalogQueries.queries ++
      MultimodalQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ TextQueries.oracles ++ PipelineQueries.oracles ++
      VectorQueries.oracles ++ TpchQueries.oracles ++ TpchCatalogQueries.oracles ++
      MultimodalQueries.oracles
}
