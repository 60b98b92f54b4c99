package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Cohort retention matrix — SURVEY.md §2 item 170.
  *
  * The week-grain generalization of events_retention: users are
  * cohorted by the week of their FIRST event, and each later active
  * week counts them at (cohort_week, week_offset) — the standard
  * product-analytics triangle.
  *
  * Scale shape: one groupBy(user) for first-seen, one shuffle join
  * back on user_id (both sides hash-partitioned on the same key —
  * at 100 TB this is the unavoidable co-location shuffle, kept to
  * exactly one pass over events), then a distinct-user count per
  * (cohort, offset) cell. The cell count is bounded by weeks², not by
  * data volume, so the final aggregate is tiny. */
object Cohorts {

  def cohortMatrix(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
    val firstSeen = ev.groupBy("user_id")
      .agg(min("wk").as("cohort_week"))
    ev.join(firstSeen, "user_id")
      .withColumn("week_offset",
        floor(datediff(col("wk"), col("cohort_week")) / 7).cast("int"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  val cohortMatrixSql: String =
    """WITH ev AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
      |first_seen AS (
      |  SELECT user_id, min(wk) AS cohort_week FROM ev GROUP BY user_id)
      |SELECT cohort_week,
      |  CAST(floor(date_diff('day', cohort_week, wk) / 7) AS INT) AS week_offset,
      |  count(DISTINCT e.user_id) AS n_users
      |FROM ev e JOIN first_seen f ON e.user_id = f.user_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
