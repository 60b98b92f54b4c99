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
    "bronze_ingest" -> (etl.EtlQueries.bronzeIngest _),
    "dq_report" -> (etl.EtlQueries.dqReport _),
    "medians_modes" -> (etl.EtlQueries.mediansModes _),
    "silver_dedup" -> (etl.EtlQueries.silverDedup _),
    "silver_pipeline" -> (etl.EtlQueries.silverPipeline _),
    "incremental_upsert" -> (etl.EtlQueries.incrementalUpsert _),
    "load_report" -> (etl.EtlQueries.loadReport _),
    "q1_agg" -> (analytics.Queries.q1Agg _)
  )

  /** DuckDB oracle SQL, same column aliases as the Spark queries. */
  def oracleSql: Map[String, String] = Map(
    "bronze_ingest" -> etl.EtlQueries.bronzeIngestSql,
    "dq_report" -> etl.EtlQueries.dqReportSql,
    "medians_modes" -> etl.EtlQueries.mediansModesSql,
    "silver_dedup" -> etl.EtlQueries.silverDedupSql,
    "silver_pipeline" -> etl.EtlQueries.silverPipelineSql,
    "incremental_upsert" -> etl.EtlQueries.incrementalUpsertSql,
    "load_report" -> etl.EtlQueries.loadReportSql,
    "q1_agg" -> analytics.Queries.q1AggSql
  )
}
