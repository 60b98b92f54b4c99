package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Kaplan–Meier survival estimation — SURVEY.md §2.219.
  *
  * Time-to-event with right-censoring: the lifetime analysis every
  * subscription/engagement warehouse runs, and the one the naive
  * "average days to convert among converters" query gets WRONG
  * (dropping censored users biases the estimate — the whole point of
  * KM is that not-yet-converted users contribute their lower bound).
  */
object Survival {

  /** Only purchases above this value count as the conversion event —
    * the big-ticket purchase a fraction of users never make, so the
    * curve carries BOTH conversions and right-censored users (every
    * user makes some small purchase on this corpus, which would leave
    * the censoring path vacuously untested). */
  val ConvValueMin = 120.0

  /** §2.219 `survival_km`: Kaplan–Meier curve for days from a user's
    * first event to their first big-ticket purchase
    * (value > [[ConvValueMin]]); users who never make one are
    * right-censored at the corpus horizon (their time-to-convert is
    * known only to exceed their observation window). d_t
    * conversions and c_t censorings at each distinct duration t, risk
    * set n_t = Σ_{s≥t}(d_s+c_s), Ŝ(t) = Π_{s≤t}(1 − d_s/n_s) — the
    * probability of still being un-converted after t days.
    *
    * Scale shape: the corpus collapses to user grain in ONE
    * map-side-combined groupBy (min/max day per user — the only
    * corpus-sized shuffle), then to lifetime grain (bounded by the
    * calendar: a decade is ≤ 3 653 rows whatever the corpus size);
    * the product-limit recursion is a cumulative window over that
    * bounded frame, and the horizon is a 1-row broadcast.
    *
    * Determinism: d and n are exact BIGINTs, so each hazard factor
    * 1 − d/n is one division of identical integers; the cumulative
    * product runs as exp∘Σ∘ln with each ln addend rounded at 6 dp
    * BEFORE the ordered window sum (the §2.149 per-addend-rounding
    * rule — engine-local addition order cannot flip the final 6 dp
    * rounding), and an S=0 guard (cumulative min factor) avoids
    * ln(0) = −∞ arithmetic entirely. */
  def survivalKm(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("value"),
        to_date(col("ts")).as("day"))
    val users = ev.groupBy("user_id")
      .agg(min("day").as("first_day"),
        min(when(col("event_type") === "purchase" &&
          col("value") > ConvValueMin, col("day"))).as("purchase_day"))
    val horizon = ev.agg(max("day").as("h"))
    val lives = users.crossJoin(broadcast(horizon))
      .select(
        datediff(coalesce(col("purchase_day"), col("h")), col("first_day"))
          .cast("long").as("duration_days"),
        when(col("purchase_day").isNotNull, 1L).otherwise(0L).as("event"))
    val km = lives.groupBy("duration_days")
      .agg(sum("event").as("n_conv"),
        (count(lit(1)) - sum(col("event"))).as("n_censored"))
    val w = Window.orderBy("duration_days")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    km
      // risk set = everyone with a lifetime ≥ t: total minus strictly-
      // earlier exits, all exact integers off the same cumulative sum
      .withColumn("n_risk",
        sum(col("n_conv") + col("n_censored"))
          .over(Window.orderBy("duration_days")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("factor",
        lit(1.0) - col("n_conv").cast("double") / col("n_risk"))
      .withColumn("lf",
        round(log(when(col("factor") > 0, col("factor")).otherwise(1.0)), 6))
      .withColumn("survival",
        when(min("factor").over(w) === 0.0, 0.0)
          .otherwise(round(exp(sum("lf").over(w)), 6)))
      .select(col("duration_days"), col("n_risk"), col("n_conv"),
        col("n_censored"), col("survival"))
      .orderBy("duration_days")
  }

  val survivalKmSql: String =
    s"""WITH ev AS (SELECT user_id, event_type, value,
       |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
       |users AS (SELECT user_id, min(day) AS first_day,
       |    min(CASE WHEN event_type = 'purchase' AND value > $ConvValueMin
       |      THEN day END) AS purchase_day
       |  FROM ev GROUP BY 1),
       |hz AS (SELECT max(day) AS h FROM ev),
       |lives AS (SELECT
       |    CAST(date_diff('day', first_day, COALESCE(purchase_day, h))
       |      AS BIGINT) AS duration_days,
       |    CASE WHEN purchase_day IS NOT NULL THEN 1 ELSE 0 END AS event
       |  FROM users CROSS JOIN hz),
       |km AS (SELECT duration_days,
       |    CAST(sum(event) AS BIGINT) AS n_conv,
       |    CAST(count(*) - sum(event) AS BIGINT) AS n_censored
       |  FROM lives GROUP BY 1),
       |risk AS (SELECT duration_days, n_conv, n_censored,
       |    CAST(sum(n_conv + n_censored) OVER (ORDER BY duration_days
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
       |      AS n_risk
       |  FROM km),
       |f AS (SELECT duration_days, n_risk, n_conv, n_censored,
       |    1.0 - CAST(n_conv AS DOUBLE) / n_risk AS factor
       |  FROM risk),
       |lf AS (SELECT duration_days, n_risk, n_conv, n_censored, factor,
       |    round(ln(CASE WHEN factor > 0 THEN factor ELSE 1.0 END), 6)
       |      AS lf
       |  FROM f)
       |SELECT duration_days, n_risk, n_conv, n_censored,
       |  CASE WHEN min(factor) OVER (ORDER BY duration_days
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 0.0
       |    THEN 0.0
       |    ELSE round(exp(sum(lf) OVER (ORDER BY duration_days
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
       |  END AS survival
       |FROM lf ORDER BY duration_days""".stripMargin

  /** §2.279 `nelson_aalen`: Nelson–Aalen cumulative-hazard estimator
    * over the SAME lifetimes as [[survivalKm]] — Ĥ(t) = Σ_{s≤t} d_s/n_s.
    * The hazard-scale companion to KM: additive (hazards of disjoint
    * windows sum — the property a per-cohort or per-period hazard
    * decomposition needs, which the multiplicative KM curve lacks),
    * and exp(−Ĥ) is the Breslow survival estimate reported alongside
    * for direct comparison with KM.
    *
    * Scale shape: identical to KM — corpus → user grain in one
    * map-side-combined groupBy, then calendar-bounded lifetime grain;
    * the cumulative sum is a window over that bounded frame.
    *
    * Determinism: d/n is one division of exact BIGINTs per row,
    * rounded at 6 dp BEFORE the ordered cumulative sum (the §2.149
    * per-addend rule), matching the KM log-domain contract. */
  def nelsonAalen(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("value"),
        to_date(col("ts")).as("day"))
    val users = ev.groupBy("user_id")
      .agg(min("day").as("first_day"),
        min(when(col("event_type") === "purchase" &&
          col("value") > ConvValueMin, col("day"))).as("purchase_day"))
    val horizon = ev.agg(max("day").as("h"))
    val lives = users.crossJoin(broadcast(horizon))
      .select(
        datediff(coalesce(col("purchase_day"), col("h")), col("first_day"))
          .cast("long").as("duration_days"),
        when(col("purchase_day").isNotNull, 1L).otherwise(0L).as("event"))
    val na = lives.groupBy("duration_days")
      .agg(sum("event").as("n_conv"),
        (count(lit(1)) - sum(col("event"))).as("n_censored"))
    val w = Window.orderBy("duration_days")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    na
      .withColumn("n_risk",
        sum(col("n_conv") + col("n_censored"))
          .over(Window.orderBy("duration_days")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("hz",
        round(col("n_conv").cast("double") / col("n_risk"), 6))
      .withColumn("cum_hazard", round(sum("hz").over(w), 6))
      .withColumn("breslow_survival", round(exp(-sum("hz").over(w)), 6))
      .select(col("duration_days"), col("n_risk"), col("n_conv"),
        col("n_censored"), col("cum_hazard"), col("breslow_survival"))
      .orderBy("duration_days")
  }

  val nelsonAalenSql: String =
    s"""WITH ev AS (SELECT user_id, event_type, value,
       |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
       |users AS (SELECT user_id, min(day) AS first_day,
       |    min(CASE WHEN event_type = 'purchase' AND value > $ConvValueMin
       |      THEN day END) AS purchase_day
       |  FROM ev GROUP BY 1),
       |hz AS (SELECT max(day) AS h FROM ev),
       |lives AS (SELECT
       |    CAST(date_diff('day', first_day, COALESCE(purchase_day, h))
       |      AS BIGINT) AS duration_days,
       |    CASE WHEN purchase_day IS NOT NULL THEN 1 ELSE 0 END AS event
       |  FROM users CROSS JOIN hz),
       |na AS (SELECT duration_days,
       |    CAST(sum(event) AS BIGINT) AS n_conv,
       |    CAST(count(*) - sum(event) AS BIGINT) AS n_censored
       |  FROM lives GROUP BY 1),
       |risk AS (SELECT duration_days, n_conv, n_censored,
       |    CAST(sum(n_conv + n_censored) OVER (ORDER BY duration_days
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
       |      AS n_risk
       |  FROM na),
       |hzd AS (SELECT duration_days, n_risk, n_conv, n_censored,
       |    round(CAST(n_conv AS DOUBLE) / n_risk, 6) AS hz
       |  FROM risk)
       |SELECT duration_days, n_risk, n_conv, n_censored,
       |  round(sum(hz) OVER (ORDER BY duration_days
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
       |    AS cum_hazard,
       |  round(exp(-sum(hz) OVER (ORDER BY duration_days
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
       |    AS breslow_survival
       |FROM hzd ORDER BY duration_days""".stripMargin
  /** §2.300 `logrank_test`: two-sample log-rank test over the SAME
    * right-censored lifetimes as [[survivalKm]], arms split by the
    * §2.170 user-id parity rule — "do the two arms' time-to-convert
    * curves differ?", the hypothesis test that completes the survival
    * family (KM draws the curves, Nelson–Aalen the hazards, log-rank
    * says whether the gap is signal). At each duration t with d_t > 0
    * total conversions the test treats arm-A conversions as a
    * hypergeometric draw: E_A(t) = d_t·n_A(t)/n(t),
    * V(t) = d_t·(n_A/n)·(n_B/n)·(n−d)/(n−1); the statistic is
    * z = (O_A − ΣE_A)/√ΣV ~ N(0,1) under H₀ (Mantel–Haenszel form).
    *
    * Scale shape: identical to KM — the corpus collapses to user
    * grain in ONE map-side-combined groupBy, then to (duration, arm)
    * cells bounded by the calendar; risk sets are suffix-window sums
    * over that bounded frame and the test statistic is a 1-row
    * reduction of it.
    *
    * Determinism: all counts are exact BIGINTs; each E and V addend
    * is one fixed-sequence expression of identical integers rounded
    * into exact micro-units (×10⁶, the §2.203 integer-carry trick)
    * BEFORE the cross-row sum, so both engines sum identical
    * integers; z and χ² are single final expressions of those sums. */
  def logrankTest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("value"),
        to_date(col("ts")).as("day"))
    val users = ev.groupBy("user_id")
      .agg(min("day").as("first_day"),
        min(when(col("event_type") === "purchase" &&
          col("value") > ConvValueMin, col("day"))).as("purchase_day"))
    val horizon = ev.agg(max("day").as("h"))
    val lives = users.crossJoin(broadcast(horizon))
      .select((col("user_id") % 2).as("arm"),
        datediff(coalesce(col("purchase_day"), col("h")), col("first_day"))
          .cast("long").as("duration_days"),
        when(col("purchase_day").isNotNull, 1L).otherwise(0L).as("event"))
    val cells = lives.groupBy("duration_days")
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("x_a"),
        sum(when(col("arm") === 0, col("event")).otherwise(0L)).as("d_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("x_b"),
        sum(when(col("arm") === 1, col("event")).otherwise(0L)).as("d_b"))
    val wRisk = Window.orderBy("duration_days")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val risk = cells
      .withColumn("n_a", sum("x_a").over(wRisk))
      .withColumn("n_b", sum("x_b").over(wRisk))
      .withColumn("d", col("d_a") + col("d_b"))
      .withColumn("n", col("n_a") + col("n_b"))
      .filter(col("d") > 0)
      .withColumn("e_micro",
        round(col("d").cast("double") * col("n_a") / col("n") * 1000000)
          .cast("long"))
      .withColumn("v_micro",
        when(col("n") > 1,
          round(col("d").cast("double") * col("n_a") / col("n") *
            col("n_b") / col("n") * (col("n") - col("d")) /
            (col("n") - 1) * 1000000).cast("long"))
          .otherwise(0L))
    val arms = lives.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_users_a"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_users_b"))
    val t = risk.agg(sum("d_a").as("obs_a"), sum("d_b").as("obs_b"),
      sum("e_micro").as("em"), sum("v_micro").as("vm"))
    val z = (col("obs_a") - col("em") / 1000000.0) /
      sqrt(col("vm") / 1000000.0)
    t.crossJoin(broadcast(arms)).select(
      col("n_users_a"), col("n_users_b"), col("obs_a"), col("obs_b"),
      round(col("em") / 1000000.0, 6).as("exp_a"),
      round((col("obs_a") + col("obs_b")) - col("em") / 1000000.0, 6)
        .as("exp_b"),
      round(col("vm") / 1000000.0, 6).as("variance"),
      round(z, 6).as("z_logrank"),
      round(z * z, 6).as("chi2"),
      (abs(z) > 1.96).as("significant"))
  }

  val logrankTestSql: String = {
    val z = "((obs_a - em / 1000000.0) / sqrt(vm / 1000000.0))"
    s"""WITH ev AS (SELECT user_id, event_type, value,
       |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
       |users AS (SELECT user_id, min(day) AS first_day,
       |    min(CASE WHEN event_type = 'purchase' AND value > $ConvValueMin
       |      THEN day END) AS purchase_day
       |  FROM ev GROUP BY 1),
       |hz AS (SELECT max(day) AS h FROM ev),
       |lives AS (SELECT user_id % 2 AS arm,
       |    CAST(date_diff('day', first_day, COALESCE(purchase_day, h))
       |      AS BIGINT) AS duration_days,
       |    CASE WHEN purchase_day IS NOT NULL THEN 1 ELSE 0 END AS event
       |  FROM users CROSS JOIN hz),
       |cells AS (SELECT duration_days,
       |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS x_a,
       |    CAST(sum(CASE WHEN arm = 0 THEN event ELSE 0 END) AS BIGINT)
       |      AS d_a,
       |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS x_b,
       |    CAST(sum(CASE WHEN arm = 1 THEN event ELSE 0 END) AS BIGINT)
       |      AS d_b
       |  FROM lives GROUP BY 1),
       |risk AS (SELECT duration_days, d_a, d_b,
       |    CAST(sum(x_a) OVER (ORDER BY duration_days
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
       |      AS n_a,
       |    CAST(sum(x_b) OVER (ORDER BY duration_days
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
       |      AS n_b
       |  FROM cells),
       |mm AS (SELECT duration_days, d_a, d_b, n_a, n_b,
       |    d_a + d_b AS d, n_a + n_b AS n FROM risk WHERE d_a + d_b > 0),
       |mic AS (SELECT d_a, d_b,
       |    CAST(round(CAST(d AS DOUBLE) * n_a / n * 1000000) AS BIGINT)
       |      AS e_micro,
       |    CASE WHEN n > 1 THEN
       |      CAST(round(CAST(d AS DOUBLE) * n_a / n * n_b / n * (n - d)
       |        / (n - 1) * 1000000) AS BIGINT)
       |    ELSE 0 END AS v_micro
       |  FROM mm),
       |arms AS (SELECT
       |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_users_a,
       |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_users_b
       |  FROM lives),
       |t AS (SELECT CAST(sum(d_a) AS BIGINT) AS obs_a,
       |    CAST(sum(d_b) AS BIGINT) AS obs_b,
       |    CAST(sum(e_micro) AS BIGINT) AS em,
       |    CAST(sum(v_micro) AS BIGINT) AS vm
       |  FROM mic)
       |SELECT n_users_a, n_users_b, obs_a, obs_b,
       |  round(em / 1000000.0, 6) AS exp_a,
       |  round((obs_a + obs_b) - em / 1000000.0, 6) AS exp_b,
       |  round(vm / 1000000.0, 6) AS variance,
       |  round($z, 6) AS z_logrank,
       |  round($z * $z, 6) AS chi2,
       |  abs($z) > 1.96 AS significant
       |FROM t CROSS JOIN arms""".stripMargin
  }
}
