package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (one entry per implemented operator
  * from SURVEY.md §2 plus the training-data-pipeline extensions); `oracleSql`
  * holds the DuckDB-runnable oracle for every SQL-expressible entry.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.TransEQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.StreamingQueries.queries ++
      graft.queries.GraphQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.TransEQueries.oracles ++
      graft.queries.PipelineQueries.oracles ++
      graft.queries.StreamingQueries.oracles ++
      graft.queries.GraphQueries.oracles
}
