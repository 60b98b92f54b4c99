package graft.dq

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.154 join-key skew report — the planning DQ check a 100 TB
  * deployment runs BEFORE committing to a join strategy: for each
  * candidate join/partition key, the key-cardinality profile
  * (distinct keys, max/mean/stddev rows per key, and the max/mean
  * skew ratio). A ratio near 1 says hash partitioning balances; a
  * large ratio flags the keys that need AQE skew-split, salting
  * (operators/Skew.scala), or a broadcast rethink. The reference's GX
  * suite checks value ranges; this is the engine-shaped sibling for
  * DISTRIBUTION shape.
  *
  * Scale shape: per profiled key, one map-side-combined groupBy
  * collapses the corpus to key grain, then a single second-level
  * aggregation collapses key grain to ONE row — two linear passes,
  * no windows, no percentile buffering (stddev is the mergeable
  * moment aggregate, exactly computable at any scale; an exact p99
  * over keys would need the §2.3 selection machinery for no added
  * decision value). Profiles run per key and union — each is an
  * independent linear job over pruned single-column scans. */
object SkewReport {

  private def profile(df: DataFrame, table: String, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_keys"), max("c").as("max_rows"),
        avg("c").as("avg_raw"), // skew divides the UNROUNDED mean, as the oracle does
        round(stddev_samp(col("c").cast("double")), 4).as("stddev_rows"))
      .select(lit(table).as("tbl"), lit(key).as("key_col"),
        col("n_keys"), col("max_rows"),
        round(col("avg_raw"), 4).as("avg_rows"), col("stddev_rows"),
        round(col("max_rows") / col("avg_raw"), 4).as("skew_ratio"))

  def skewReport(spark: SparkSession, dir: String): DataFrame =
    Seq(
      profile(Tables.lineitem(spark, dir), "lineitem", "l_orderkey"),
      profile(Tables.lineitem(spark, dir), "lineitem", "l_partkey"),
      profile(Tables.lineitem(spark, dir), "lineitem", "l_suppkey"),
      profile(Tables.orders(spark, dir), "orders", "o_custkey"),
      profile(Tables.events(spark, dir), "events", "user_id"),
      profile(Tables.events(spark, dir), "events", "event_type"),
      profile(Tables.documents(spark, dir), "documents", "lang"))
    .reduce(_.unionAll(_))
    .orderBy("tbl", "key_col")

  private def profileSql(table: String, key: String): String =
    s"""SELECT '$table' AS tbl, '$key' AS key_col,
       |  count(*) AS n_keys, max(c) AS max_rows,
       |  round(avg(c), 4) AS avg_rows,
       |  round(stddev_samp(CAST(c AS DOUBLE)), 4) AS stddev_rows,
       |  round(max(c) / avg(c), 4) AS skew_ratio
       |FROM (SELECT $key, count(*) AS c FROM $table GROUP BY 1) t""".stripMargin

  val skewReportSql: String =
    Seq(("lineitem", "l_orderkey"), ("lineitem", "l_partkey"),
      ("lineitem", "l_suppkey"), ("orders", "o_custkey"),
      ("events", "user_id"), ("events", "event_type"),
      ("documents", "lang"))
      .map { case (t, k) => s"(${profileSql(t, k)})" }
      .mkString("", "\nUNION ALL\n", "\nORDER BY tbl, key_col")
}
