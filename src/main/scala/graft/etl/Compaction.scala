package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Compaction bin-packing plan — SURVEY.md §2.340.
  *
  * §2.59 EXECUTES small-file compaction; at 100 TB nobody executes a
  * compaction without PRICING it first (which ranges coalesce into
  * which output files, how full each lands, where a single oversized
  * partition forces an overflow). The standard production planner is
  * next-fit over the table's natural sort order: keep key-adjacent
  * data together (so downstream range pruning still works after the
  * rewrite — the §2.293 argument), sweep the file list once, cut a new
  * output bin whenever the running mass passes the target size. That
  * sweep is ONE cumulative sum: bin(i) = floor(cum_before(i) / T) —
  * pure arithmetic, no packing loop, which is exactly what makes it
  * plannable inside the engine on a bounded stats frame instead of in
  * a driver-side scheduler.
  */
object Compaction {

  /** Output bins per plan (the compaction fan-in target). */
  val NBins = 32L

  /** §2.340 `compaction_plan`: the events table's (day, event_type)
    * partitions as the file list, planned into ≤ [[NBins]]+1 output
    * bins by the next-fit cumulative rule over (day, type) order. Per
    * bin: file count, row mass, the target, fill share, the overfull
    * flag (a bin exceeds T only when one FILE straddles the boundary —
    * next-fit never splits a file), and the bin's day range (the range
    * pruning the plan preserves).
    *
    * Scale shape: the corpus collapses to the calendar×|types|-bounded
    * file frame in ONE map-side groupBy; the cumulative window, the
    * bin groupBy, and every total run on that bounded frame. The plan
    * never touches a data byte — it prices the rewrite from stats,
    * the point of planning before a 100 TB pass.
    *
    * Determinism: all masses exact BIGINTs; T = ceil-div by integer
    * arithmetic ((total + N−1) div N); bin ids integer floor-div;
    * fill is one division of integer-valued doubles rounded 6 dp;
    * the overfull flag is an integer comparison. */
  def compactionPlan(spark: SparkSession, dir: String): DataFrame = {
    val files = Tables.events(spark, dir)
      .select(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .groupBy("day", "event_type").agg(count(lit(1)).as("rows"))
    val wAll = Window.partitionBy(lit(1))
    val wCum = Window.orderBy("day", "event_type")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def dbl(c: Column): Column = c.cast("double")
    files
      .withColumn("cum", sum("rows").over(wCum))
      .withColumn("total", sum("rows").over(wAll))
      .withColumn("target", expr(s"(total + ${NBins - 1}) div $NBins"))
      .withColumn("bin", expr("(cum - rows) div target"))
      .groupBy("bin").agg(
        count(lit(1)).as("n_files"),
        sum("rows").as("bin_rows"),
        min("day").as("first_day"),
        max("day").as("last_day"),
        max("target").as("target_rows"))
      .withColumn("fill",
        when(col("target_rows") > 0L,
          round(dbl(col("bin_rows")) / dbl(col("target_rows")), 6)))
      .withColumn("overfull",
        when(col("bin_rows") > col("target_rows"), 1L).otherwise(0L))
      .select("bin", "n_files", "bin_rows", "target_rows", "fill",
        "overfull", "first_day", "last_day")
      .orderBy("bin")
  }

  val compactionPlanSql: String =
    s"""WITH files AS (SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, event_type,
       |    count(*) AS rows
       |  FROM events GROUP BY 1, 2),
       |swept AS (SELECT *,
       |    CAST(sum(rows) OVER (ORDER BY day, event_type
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum,
       |    CAST(sum(rows) OVER () AS BIGINT) AS total
       |  FROM files),
       |binned AS (SELECT *,
       |    (total + ${NBins - 1}) // $NBins AS target,
       |    (cum - rows) // ((total + ${NBins - 1}) // $NBins) AS bin
       |  FROM swept)
       |SELECT bin, count(*) AS n_files,
       |  CAST(sum(rows) AS BIGINT) AS bin_rows,
       |  CAST(max(target) AS BIGINT) AS target_rows,
       |  CASE WHEN max(target) > 0 THEN round(
       |    CAST(sum(rows) AS DOUBLE) / CAST(max(target) AS DOUBLE), 6)
       |    END AS fill,
       |  CASE WHEN sum(rows) > max(target) THEN 1 ELSE 0 END AS overfull,
       |  min(day) AS first_day, max(day) AS last_day
       |FROM binned GROUP BY 1 ORDER BY bin""".stripMargin
}
