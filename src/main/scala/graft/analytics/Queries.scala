package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational analytics operators — SURVEY.md §2 items 8–20.
  *
  * Metabase-dashboard equivalents of the reference (top-N, per-group
  * aggregates, distributions, time series; cf. /root/reference/README.md
  * "Report Visualization") re-expressed over the test star schema.
  *
  * Scale notes: every query filters/projects before shuffling (parquet
  * pushdown), keeps aggregation partial (map-side combine), and
  * broadcasts dimension tables. The trailing orderBy exists only for
  * oracle determinism — Catalyst's EliminateSorts drops it under the
  * bench's `count()` action.
  */
object Queries {

  /** Grouped aggregation with map-side partial agg (TPC-H Q1 shape). */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 4).as("sum_qty"),
        round(sum("l_extendedprice"), 4).as("sum_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("sum_disc_price"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 4) AS sum_qty,
      |  round(sum(l_extendedprice), 4) AS sum_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
      |  round(avg(l_discount), 6) AS avg_disc,
      |  count(*) AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
