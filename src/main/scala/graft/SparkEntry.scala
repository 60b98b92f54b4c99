package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 + §7.
  *
  * Each `queries` key is one operator from the SURVEY.md §2 inventory;
  * `oracleSql` holds the DuckDB-equivalent SQL over the same parquet
  * tables (omitted only for non-SQL-expressible ops → rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    analytics.Queries.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (analytics.Queries.q1Agg _)
  )

  /** DuckDB oracle SQL, same column aliases as the Spark queries. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> analytics.Queries.q1AggSql
  )
}
