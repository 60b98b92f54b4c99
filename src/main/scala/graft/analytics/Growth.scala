package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Growth accounting and engagement-streak diagnostics —
  * SURVEY.md §2.249–250.
  */
object Growth {

  /** §2.249 `growth_accounting`: the standard weekly growth-accounting
    * decomposition (the "quick ratio" frame) — every active user-week
    * classifies as NEW (first week ever), RETAINED (also active the
    * prior week) or RESURRECTED (active before, gap ≥ 2 weeks), and
    * CHURNED counts users active the prior week who went silent this
    * week. Identity: active(w) = new + retained + resurrected and
    * churned(w) = active(w−1) − retained(w) — both pinned by the spec.
    *
    * Scale shape: the corpus collapses to distinct (user, week) ONCE
    * (map-side-combined), the status lag/lead windows run per user
    * over that user-weeks frame (one exchange on user_id), and the
    * report aggregates to the calendar-bounded week grain.
    *
    * Determinism: pure integer counts on exact week boundaries
    * (Monday-start `date_trunc('week')` on both engines). */
  def growthAccounting(spark: SparkSession, dir: String): DataFrame = {
    val uw = Tables.events(spark, dir)
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("week"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("week")
    val lagged = uw
      .withColumn("prev", lag("week", 1).over(w))
      .withColumn("next", lead("week", 1).over(w))
    val status = lagged.select(col("week"),
      when(col("prev").isNull, "new")
        .when(col("prev") === date_sub(col("week"), 7), "retained")
        .otherwise("resurrected").as("status"))
    val maxWeek = uw.agg(max("week").as("max_week"))
    val churn = lagged
      .withColumn("churn_week", date_add(col("week"), 7))
      .crossJoin(broadcast(maxWeek))
      .filter((col("next").isNull || col("next") > col("churn_week")) &&
        col("churn_week") <= col("max_week"))
      .select(col("churn_week").as("week"), lit("churned").as("status"))
    status.unionAll(churn)
      .groupBy("week").pivot("status",
        Seq("new", "retained", "resurrected", "churned"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("new", "retained", "resurrected", "churned"))
      .select(col("week").cast("timestamp").as("week"),
        col("new").as("n_new"), col("retained").as("n_retained"),
        col("resurrected").as("n_resurrected"),
        col("churned").as("n_churned"),
        (col("new") + col("retained") + col("resurrected")).as("n_active"))
      .orderBy("week")
  }

  val growthAccountingSql: String =
    """WITH uw AS (SELECT DISTINCT user_id,
      |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week
      |  FROM events),
      |lagged AS (SELECT user_id, week,
      |    lag(week) OVER (PARTITION BY user_id ORDER BY week) AS prev,
      |    lead(week) OVER (PARTITION BY user_id ORDER BY week) AS next
      |  FROM uw),
      |status AS (SELECT week,
      |    CASE WHEN prev IS NULL THEN 'new'
      |      WHEN prev = week - 7 THEN 'retained'
      |      ELSE 'resurrected' END AS status
      |  FROM lagged),
      |mw AS (SELECT max(week) AS max_week FROM uw),
      |churn AS (SELECT week + 7 AS week, 'churned' AS status
      |  FROM lagged CROSS JOIN mw
      |  WHERE (next IS NULL OR next > week + 7) AND week + 7 <= max_week),
      |allrows AS (SELECT * FROM status UNION ALL SELECT * FROM churn)
      |SELECT CAST(week AS TIMESTAMP) AS week,
      |  count(*) FILTER (WHERE status = 'new') AS n_new,
      |  count(*) FILTER (WHERE status = 'retained') AS n_retained,
      |  count(*) FILTER (WHERE status = 'resurrected') AS n_resurrected,
      |  count(*) FILTER (WHERE status = 'churned') AS n_churned,
      |  count(*) FILTER (WHERE status IN ('new', 'retained',
      |    'resurrected')) AS n_active
      |FROM allrows GROUP BY 1 ORDER BY 1""".stripMargin

  /** §2.250 `streak_lengths`: distribution of each user's LONGEST
    * consecutive-active-day streak — the engagement-depth histogram
    * habit-formation analyses start from. Gaps-and-islands at the
    * user grain: island id = day − row_number (§2.132's span-merge
    * trick on the calendar), longest island per user, then a
    * histogram over users.
    *
    * Scale shape: distinct (user, day) once; the row_number window is
    * one user_id exchange; everything after is user-sized then
    * streak-histogram-sized. Integers end-to-end. */
  def streakLengths(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    val islands = ud
      .withColumn("grp", expr(
        "date_sub(day, CAST(row_number() OVER " +
          "(PARTITION BY user_id ORDER BY day) AS INT))"))
      .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
    islands.groupBy("user_id").agg(max("len").as("max_streak"))
      .groupBy("max_streak").agg(count(lit(1)).as("n_users"))
      .orderBy("max_streak")
  }

  val streakLengthsSql: String =
    """WITH ud AS (SELECT DISTINCT user_id,
      |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
      |isl AS (SELECT user_id,
      |    day - CAST(row_number() OVER
      |      (PARTITION BY user_id ORDER BY day) AS INTEGER) AS grp
      |  FROM ud),
      |runs AS (SELECT user_id, grp, count(*) AS len
      |  FROM isl GROUP BY 1, 2),
      |peruser AS (SELECT user_id, CAST(max(len) AS BIGINT) AS max_streak
      |  FROM runs GROUP BY 1)
      |SELECT max_streak, count(*) AS n_users
      |FROM peruser GROUP BY 1 ORDER BY 1""".stripMargin
}
