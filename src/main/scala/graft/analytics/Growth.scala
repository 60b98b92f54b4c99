package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** §2.260 `item_novelty`: weekly content-freshness — per week, the
    * share of interaction volume going to items FIRST SEEN that week
    * (catalog novelty) and the new-item count. A recommender/corpus
    * health metric: a feed whose new-item share decays is ossifying
    * (the §2.207 coverage report's time axis).
    *
    * Scale shape: item first-seen = one map-side min() groupBy at the
    * catalog grain, broadcast back onto the weekly item volume (also
    * catalog×weeks-bounded). Integers to the one share division. */
  def itemNovelty(spark: SparkSession, dir: String): DataFrame = {
    val iv = Tables.events(spark, dir)
      .withColumn("item", get_json_object(col("props"), "$.k").cast("int"))
      .filter(col("item").isNotNull)
      .select(col("item"),
        date_trunc("week", col("ts")).cast("date").as("week"))
    val weekly = iv.groupBy("week", "item").agg(count(lit(1)).as("n"))
    val firstSeen = weekly.groupBy("item").agg(min("week").as("first_week"))
    weekly.join(broadcast(firstSeen), Seq("item"))
      .groupBy("week")
      .agg(sum("n").as("n_events"),
        count(lit(1)).as("n_items"),
        sum(when(col("week") === col("first_week"), col("n"))
          .otherwise(0L)).as("new_item_events"),
        sum(when(col("week") === col("first_week"), 1L).otherwise(0L))
          .as("n_new_items"))
      .select(col("week").cast("timestamp").as("week"),
        col("n_events"), col("n_items"), col("n_new_items"),
        round(col("new_item_events").cast("double") / col("n_events"), 6)
          .as("novelty_share"))
      .orderBy("week")
  }

  val itemNoveltySql: String =
    """WITH iv AS (SELECT
      |    CAST(json_extract_string(props, '$.k') AS INTEGER) AS item,
      |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week
      |  FROM events
      |  WHERE json_extract_string(props, '$.k') IS NOT NULL),
      |weekly AS (SELECT week, item, count(*) AS n FROM iv GROUP BY 1, 2),
      |fs AS (SELECT item, min(week) AS first_week FROM weekly GROUP BY 1)
      |SELECT CAST(week AS TIMESTAMP) AS week,
      |  CAST(sum(n) AS BIGINT) AS n_events,
      |  count(*) AS n_items,
      |  CAST(sum(CASE WHEN week = first_week THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_new_items,
      |  round(CAST(sum(CASE WHEN week = first_week THEN n ELSE 0 END)
      |    AS DOUBLE) / sum(n), 6) AS novelty_share
      |FROM weekly JOIN fs USING (item)
      |GROUP BY week ORDER BY week""".stripMargin

  /** §2.261 `interevent_stats`: per-user inter-event-time burstiness,
    * summarized over the population — per user the coefficient of
    * variation of consecutive-event gaps (CV = 1 Poisson, ≫1 bursty
    * — Goh & Barabási 2008), then the population's quartiles of CV
    * and the bursty-user share. §2.236 measures burstiness of the
    * aggregate stream; this measures it per USER, where bots (CV≈0
    * cron cadence) and binge sessions separate.
    *
    * Scale shape: one user_id exchange for the lag window; per-user
    * gap moments are exact integer sums (epoch-second gaps); the
    * population summary interpolates over per-user CVs (identical
    * doubles both engines — §2.141).
    *
    * Users need ≥ 3 events (≥ 2 gaps) to have a defined CV. */
  def intereventStats(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gaps = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("prev", lag("ts", 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("user_id"),
        (unix_micros(col("ts")) - unix_micros(col("prev"))).as("gap"))
    // gap is exact integer MICROSECONDS (ts carries sub-second parts;
    // second-floored gaps would differ between engines); gap^2 at day
    // scale is ~1e22 -- BIGINT overflows, so s2 sums as DECIMAL(38,0)
    val dec = "decimal(38,0)"
    val perUser = gaps.groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"),
        sum("gap").as("s1"),
        sum((col("gap").cast(dec) * col("gap").cast(dec)).cast(dec))
          .as("s2"))
      .filter(col("n_gaps") >= 2)
      .withColumn("mu", col("s1").cast("double") / col("n_gaps"))
      .withColumn("sd", sqrt(greatest(
        (col("s2").cast("double") - col("n_gaps").cast("double") *
          col("mu") * col("mu")) / (col("n_gaps").cast("double") - 1.0),
        lit(0.0))))
      .filter(col("mu") > 0)
      .withColumn("cv", col("sd") / col("mu"))
    perUser.agg(count(lit(1)).as("n_users"),
      round(expr("percentile(cv, 0.25)"), 4).as("cv_p25"),
      round(expr("percentile(cv, 0.5)"), 4).as("cv_median"),
      round(expr("percentile(cv, 0.75)"), 4).as("cv_p75"),
      sum(when(col("cv") > 1.5, 1L).otherwise(0L)).as("n_bursty"))
      .withColumn("bursty_share",
        round(col("n_bursty").cast("double") / col("n_users"), 6))
  }

  val intereventStatsSql: String =
    """WITH gaps AS (SELECT user_id,
      |    epoch_us(CAST(ts AS TIMESTAMP))
      |      - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER
      |        (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP),
      |          event_id)) AS gap
      |  FROM events),
      |g AS (SELECT user_id, gap FROM gaps WHERE gap IS NOT NULL),
      |pu AS (SELECT user_id, count(*) AS n_gaps,
      |    CAST(sum(gap) AS BIGINT) AS s1,
      |    sum(CAST(gap AS HUGEINT) * gap) AS s2
      |  FROM g GROUP BY 1),
      |cvd AS (SELECT user_id, n_gaps,
      |    CAST(s1 AS DOUBLE) / n_gaps AS mu,
      |    sqrt(GREATEST((CAST(s2 AS DOUBLE) - CAST(n_gaps AS DOUBLE)
      |        * (CAST(s1 AS DOUBLE) / n_gaps) * (CAST(s1 AS DOUBLE) / n_gaps))
      |      / (CAST(n_gaps AS DOUBLE) - 1.0), 0.0)) AS sd
      |  FROM pu WHERE n_gaps >= 2),
      |cv AS (SELECT sd / mu AS cv FROM cvd WHERE mu > 0)
      |SELECT count(*) AS n_users,
      |  round(quantile_cont(cv, 0.25), 4) AS cv_p25,
      |  round(quantile_cont(cv, 0.5), 4) AS cv_median,
      |  round(quantile_cont(cv, 0.75), 4) AS cv_p75,
      |  CAST(sum(CASE WHEN cv > 1.5 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_bursty,
      |  round(CAST(sum(CASE WHEN cv > 1.5 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*), 6) AS bursty_share
      |FROM cv""".stripMargin
  /** Rows returned by [[rankMovers]] — the dashboard's "biggest
    * movers" page size. */
  val MoversTopK = 20

  /** §2.313 `rank_movers`: week-over-week-style popularity movement —
    * items ranked by click count in the first vs second calendar half
    * (the §2.254 floored midpoint), reporting the [[MoversTopK]]
    * biggest absolute RANK movers with both counts and ranks. Rank
    * deltas are the trend signal a merchandising/recsys dashboard
    * actually pages through — count deltas just re-rank the head, rank
    * deltas surface the riser from position 400.
    *
    * Scale shape: ONE corpus scan → item-grain conditional aggregate
    * (catalog-bounded), the half boundary a 1-row broadcast; the two
    * rank windows and the top-k order run over the catalog frame.
    *
    * Determinism: ranks are row_number over the total order
    * (count desc, item asc); delta/top-k all-integer with a unique
    * (|delta| desc, item) tiebreak on both engines. */
  def rankMovers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("event_type") === "click")
      .select(get_json_object(col("props"), "$.k").cast("bigint").as("item"),
        to_date(col("ts")).as("day"))
      .filter(col("item").isNotNull)
    val mid = ev.agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("d0"),
        floor(datediff(col("d1"), col("d0")) / 2).cast("int").as("half"))
    val items = ev.crossJoin(broadcast(mid))
      .groupBy("item").agg(
        sum(when(datediff(col("day"), col("d0")) < col("half"), 1L)
          .otherwise(0L)).as("clicks_h1"),
        sum(when(datediff(col("day"), col("d0")) < col("half"), 0L)
          .otherwise(1L)).as("clicks_h2"))
    val ranked = items
      .withColumn("rank_h1", row_number().over(
        Window.orderBy(col("clicks_h1").desc, col("item"))).cast("long"))
      .withColumn("rank_h2", row_number().over(
        Window.orderBy(col("clicks_h2").desc, col("item"))).cast("long"))
      .withColumn("rank_delta", col("rank_h1") - col("rank_h2"))
    ranked
      .orderBy(abs(col("rank_delta")).desc, col("item"))
      .limit(MoversTopK)
      .select("item", "clicks_h1", "clicks_h2", "rank_h1", "rank_h2",
        "rank_delta")
  }

  val rankMoversSql: String =
    s"""WITH ev AS (SELECT
       |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item,
       |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
       |  FROM events WHERE event_type = 'click'
       |    AND json_extract_string(props, '$$.k') IS NOT NULL),
       |mid AS (SELECT min(day) AS d0,
       |    CAST((max(day) - min(day)) // 2 AS INTEGER) AS half FROM ev),
       |items AS (SELECT item,
       |    CAST(sum(CASE WHEN day - d0 < half THEN 1 ELSE 0 END) AS BIGINT)
       |      AS clicks_h1,
       |    CAST(sum(CASE WHEN day - d0 < half THEN 0 ELSE 1 END) AS BIGINT)
       |      AS clicks_h2
       |  FROM ev CROSS JOIN mid GROUP BY 1),
       |ranked AS (SELECT item, clicks_h1, clicks_h2,
       |    CAST(row_number() OVER (ORDER BY clicks_h1 DESC, item) AS BIGINT)
       |      AS rank_h1,
       |    CAST(row_number() OVER (ORDER BY clicks_h2 DESC, item) AS BIGINT)
       |      AS rank_h2
       |  FROM items)
       |SELECT item, clicks_h1, clicks_h2, rank_h1, rank_h2,
       |  rank_h1 - rank_h2 AS rank_delta
       |FROM ranked
       |ORDER BY abs(rank_h1 - rank_h2) DESC, item LIMIT $MoversTopK""".stripMargin

  /** Error-share SLO for [[sloBurn]] — the budget: up to 25% of events
    * may be errors before the budget burns (the synthetic stream runs
    * ~20% errors, so burn hovers near but below 1 and day-level spikes
    * read as real signal). Production would use 0.001. */
  val SloErrShare = 0.25

  /** §2.318 `slo_burn`: multi-window error-budget burn-rate table
    * (the Google-SRE alerting arithmetic): per day, the error share
    * against the [[SloErrShare]] budget as 1-day, trailing-7-day and
    * trailing-28-day burn rates (burn = share/budget; 1.0 = spending
    * exactly the budget), cumulative budget consumed, and the
    * fast/slow multiwindow alert flags (fast: 1d ≥ 2 AND 7d ≥ 2 —
    * a real spike, not one bad hour; slow: 7d ≥ 1 AND 28d ≥ 1 — a
    * slow leak that will exhaust the month). §2.151/231 DETECT
    * anomalies/changepoints; this op prices reliability against an
    * explicit budget — the difference between "something changed" and
    * "we will miss the SLO by the 12th".
    *
    * Scale shape: ONE day-grain map-side-combined groupBy (the only
    * corpus-sized stage); every window is a trailing ROWS frame over
    * the calendar-bounded day frame. Day spine assumed gapless here
    * (the corpus is); production composes §2.138's gap fill first.
    *
    * Determinism: counts exact; every share/burn is a fixed-sequence
    * division of identical integers and the shared budget literal;
    * alert flags compare those identical doubles. */
  def sloBurn(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("errs"))
    def trail(c: String, k: Int) = sum(c).over(Window.orderBy("day")
      .rowsBetween(-(k - 1), Window.currentRow))
    def d(c: Column) = c.cast("double")
    val b = lit(SloErrShare)
    val marked = days
      .withColumn("n7", trail("n", 7)).withColumn("e7", trail("errs", 7))
      .withColumn("n28", trail("n", 28))
      .withColumn("e28", trail("errs", 28))
      .withColumn("nc", trail("n", 100000))
      .withColumn("ec", trail("errs", 100000))
      .withColumn("burn_1d", round(d(col("errs")) / d(col("n")) / b, 6))
      .withColumn("burn_7d", round(d(col("e7")) / d(col("n7")) / b, 6))
      .withColumn("burn_28d", round(d(col("e28")) / d(col("n28")) / b, 6))
    marked.select(col("day").cast("timestamp").as("day"), col("n"),
      col("errs"), col("burn_1d"), col("burn_7d"), col("burn_28d"),
      round(d(col("ec")) / (d(col("nc")) * b), 6).as("budget_consumed"),
      (col("burn_1d") >= 2.0 && col("burn_7d") >= 2.0).as("alert_fast"),
      (col("burn_7d") >= 1.0 && col("burn_28d") >= 1.0).as("alert_slow"))
      .orderBy("day")
  }

  val sloBurnSql: String = {
    val b = SloErrShare
    s"""WITH days AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
       |    count(*) AS n,
       |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS errs
       |  FROM events GROUP BY 1),
       |marked AS (SELECT day, n, errs,
       |    CAST(sum(n) OVER (ORDER BY day
       |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n7,
       |    CAST(sum(errs) OVER (ORDER BY day
       |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS e7,
       |    CAST(sum(n) OVER (ORDER BY day
       |      ROWS BETWEEN 27 PRECEDING AND CURRENT ROW) AS BIGINT) AS n28,
       |    CAST(sum(errs) OVER (ORDER BY day
       |      ROWS BETWEEN 27 PRECEDING AND CURRENT ROW) AS BIGINT) AS e28,
       |    CAST(sum(n) OVER (ORDER BY day
       |      ROWS BETWEEN 99999 PRECEDING AND CURRENT ROW) AS BIGINT) AS nc,
       |    CAST(sum(errs) OVER (ORDER BY day
       |      ROWS BETWEEN 99999 PRECEDING AND CURRENT ROW) AS BIGINT) AS ec
       |  FROM days),
       |burns AS (SELECT day, n, errs, nc, ec,
       |    round(CAST(errs AS DOUBLE) / n / $b, 6) AS burn_1d,
       |    round(CAST(e7 AS DOUBLE) / n7 / $b, 6) AS burn_7d,
       |    round(CAST(e28 AS DOUBLE) / n28 / $b, 6) AS burn_28d
       |  FROM marked)
       |SELECT CAST(day AS TIMESTAMP) AS day, n, errs,
       |  burn_1d, burn_7d, burn_28d,
       |  round(CAST(ec AS DOUBLE) / (CAST(nc AS DOUBLE) * $b), 6)
       |    AS budget_consumed,
       |  burn_1d >= 2.0 AND burn_7d >= 2.0 AS alert_fast,
       |  burn_7d >= 1.0 AND burn_28d >= 1.0 AS alert_slow
       |FROM burns ORDER BY day""".stripMargin
  }

  /** §2.325 `dau_mau_stickiness`: per calendar month, average daily
    * active users over monthly active users — the engagement ratio
    * ("what fraction of the month's users show up on a given day")
    * every growth team tracks beside §2.150's rolling actives and
    * §2.249's accounting identities. DAU/MAU ≈ 1 means daily-habit
    * usage; ≈ 1/30 means once-a-month.
    *
    * Scale shape: corpus → distinct (user, day) grain (one map-side-
    * combined distinct — the §2.150 user-day spine), then bounded
    * month-grain aggregates: Σ daily-distinct counts and the exact
    * per-month distinct, both over the user-day frame.
    *
    * Determinism: all counts exact BIGINTs; stickiness is ONE
    * division sum_dau/(n_days·mau) of identical integers, 6 dp. */
  def dauMauStickiness(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"),
        date_trunc("month", col("ts")).as("month"))
      .distinct()
    val daily = ud.groupBy("month", "day").agg(count(lit(1)).as("dau"))
      .groupBy("month").agg(count(lit(1)).as("n_days"),
        sum("dau").as("sum_dau"))
    val monthly = ud.groupBy("month")
      .agg(countDistinct("user_id").as("mau"))
    daily.join(monthly, "month")
      .select(col("month"), col("n_days"), col("sum_dau"), col("mau"),
        round(col("sum_dau").cast("double") /
          (col("n_days") * col("mau")).cast("double"), 6).as("stickiness"))
      .orderBy("month")
  }

  val dauMauStickinessSql: String =
    """WITH ud AS (SELECT DISTINCT user_id,
      |    date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
      |    date_trunc('month', CAST(ts AS TIMESTAMP)) AS month
      |  FROM events),
      |daily AS (SELECT month, count(*) AS n_days,
      |    CAST(sum(dau) AS BIGINT) AS sum_dau
      |  FROM (SELECT month, day, count(*) AS dau FROM ud GROUP BY 1, 2) d
      |  GROUP BY 1),
      |monthly AS (SELECT month, count(DISTINCT user_id) AS mau FROM ud
      |  GROUP BY 1)
      |SELECT daily.month, n_days, sum_dau, mau,
      |  round(CAST(sum_dau AS DOUBLE) / CAST(n_days * mau AS DOUBLE), 6)
      |    AS stickiness
      |FROM daily JOIN monthly ON daily.month = monthly.month
      |ORDER BY 1""".stripMargin
}
