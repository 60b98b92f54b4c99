package graft.dq

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Cross-table freshness audit — SURVEY.md §2.251.
  *
  * The first question a warehouse on-call asks: which feeds are
  * stale? Wall-clock "now" is nondeterministic, so staleness is
  * measured against the freshest watermark IN the warehouse — the
  * relative lag that actually identifies the broken feed (the
  * reference's Airflow DAG encodes this as task-level freshness
  * sensors; here it's one query over the fact tables).
  */
object Freshness {

  /** §2.251 `dq_freshness`: per timestamped fact table — row count,
    * min/max event time, span, and staleness in days behind the
    * freshest table's watermark.
    *
    * Scale shape: per table ONE map-side-combined min/max/count
    * aggregate (3 rows total); the global watermark is a 1-row
    * broadcast. Integer day arithmetic end-to-end. */
  def dqFreshness(spark: SparkSession, dir: String): DataFrame = {
    def one(name: String, df: DataFrame, ts: String): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
        min(to_date(col(ts))).as("min_day"),
        max(to_date(col(ts))).as("max_day"))
        .select(lit(name).as("tbl"), col("n_rows"),
          col("min_day"), col("max_day"))
    val per = one("events", Tables.events(spark, dir), "ts")
      .unionAll(one("orders", Tables.orders(spark, dir), "o_orderdate"))
      .unionAll(one("lineitem", Tables.lineitem(spark, dir), "l_shipdate"))
    val wm = per.agg(max("max_day").as("watermark"))
    per.crossJoin(broadcast(wm))
      .select(col("tbl"), col("n_rows"),
        col("min_day").cast("timestamp").as("min_day"),
        col("max_day").cast("timestamp").as("max_day"),
        datediff(col("max_day"), col("min_day")).cast("long")
          .as("span_days"),
        datediff(col("watermark"), col("max_day")).cast("long")
          .as("staleness_days"))
      .orderBy("tbl")
  }

  val dqFreshnessSql: String =
    """WITH per AS (
      |  SELECT 'events' AS tbl, count(*) AS n_rows,
      |    min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS min_day,
      |    max(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS max_day
      |  FROM events
      |  UNION ALL
      |  SELECT 'orders', count(*),
      |    min(CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE)),
      |    max(CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE))
      |  FROM orders
      |  UNION ALL
      |  SELECT 'lineitem', count(*),
      |    min(CAST(CAST(l_shipdate AS TIMESTAMP) AS DATE)),
      |    max(CAST(CAST(l_shipdate AS TIMESTAMP) AS DATE))
      |  FROM lineitem),
      |wm AS (SELECT max(max_day) AS watermark FROM per)
      |SELECT tbl, n_rows,
      |  CAST(min_day AS TIMESTAMP) AS min_day,
      |  CAST(max_day AS TIMESTAMP) AS max_day,
      |  CAST(max_day - min_day AS BIGINT) AS span_days,
      |  CAST(watermark - max_day AS BIGINT) AS staleness_days
      |FROM per CROSS JOIN wm ORDER BY tbl""".stripMargin
}
