package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Empirical-Bayes rate shrinkage — SURVEY.md §2.346.
  *
  * Ranking groups by a raw success rate is dominated by small-n noise:
  * a 3-order nation with 2 'F' orders "beats" a 10 000-order nation at
  * 55% — the exact failure §2.330's host-quality gating and any
  * per-source corpus-quality league table hits. The standard fix is
  * empirical-Bayes shrinkage under a Beta-Binomial model (Robbins
  * 1956; the "add a prior learned from the data itself" recipe):
  * method-of-moments fits Beta(α, β) to the observed group rates,
  * then each group reports (x + α)/(n + α + β) — small groups pull
  * toward the corpus prior, big groups keep their own rate.
  *
  * MoM identities used: with m = mean(rate), v = var(rate),
  * K = α + β = m(1−m)/v − 1, α = m·K. Shrinkage applies only when
  * v is a VALID moment estimate: G > 1 groups and 0 < v < m(1−m)
  * (v ≥ m(1−m) means rates are MORE dispersed than any Beta allows —
  * K ≤ 0 — and v = 0 means no between-group signal); otherwise the
  * raw rate passes through with k_strength 0, which the 1-nation
  * degenerate corpus exercises.
  *
  * Determinism: group rates are HALF-UP integer MICRO-units, so the
  * ≤|nations| mean/variance sums are exact BIGINTs; the K > 0 gate is
  * the INTEGER compare m_e6·(10⁶ − m_e6) > var_e12; K itself is one
  * division of exact integers; and the shrunken rate is one division
  * of two DECIMAL(38,0) cross-multiplies (x·10⁶·den + m_e6·num over
  * 10⁶·(n·den + num)) — no float accumulates anywhere.
  *
  * Scale shape: one orders scan map-side combines to nation grain
  * (the customer join is a broadcast dim join), the moment fit is an
  * aggregate over that ≤25-row frame broadcast back — nothing past
  * the first aggregate touches the corpus. */
object Shrinkage {

  /** §2.346 `eb_shrinkage`: per nation — order count, 'F' count, raw
    * rate, prior strength K, prior mean, and the shrunken rate. */
  def ebShrinkage(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("f"))
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"))
    val g = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_orders"), sum("f").as("x"))
      .withColumn("rate_e6",
        expr("(2 * x * 1000000 + n_orders) div (2 * n_orders)"))
    // moment fit over the ≤|nations| frame: exact integer sums
    val mom = g.agg(
      count(lit(1)).as("n_groups"),
      sum("rate_e6").as("sum_r"),
      // Σ r², ≤ G·10¹² — BIGINT-safe to ~9·10⁶ groups
      sum(col("rate_e6") * col("rate_e6")).as("sum_r2"))
      .withColumn("m_e6",
        expr("(2 * sum_r + n_groups) div (2 * n_groups)"))
      .withColumn("var_e12", expr(
        """CASE WHEN n_groups > 1 THEN
          |(2 * (sum_r2 - (2 * m_e6 * sum_r - n_groups * m_e6 * m_e6))
          | + (n_groups - 1)) div (2 * (n_groups - 1)) ELSE 0 END"""
          .stripMargin.replace('\n', ' ')))
      // K = (m(1-m) - v)/v as exact-integer num/den, gated
      .withColumn("num", expr(
        "m_e6 * (1000000 - m_e6) - var_e12"))
      .withColumn("shrink", col("var_e12") > 0 && col("num") > 0 &&
        col("n_groups") > 1)
    g.crossJoin(broadcast(mom))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .withColumn("raw_rate",
        round(col("rate_e6").cast("double") / 1e6, 6))
      .withColumn("k_strength", when(col("shrink"),
        round(col("num").cast("double") / col("var_e12").cast("double"), 6))
        .otherwise(lit(0.0)))
      .withColumn("prior_mean",
        round(col("m_e6").cast("double") / 1e6, 6))
      .withColumn("shrunk_rate", when(col("shrink"), round(
        expr("""CAST(x AS DECIMAL(38,0)) * 1000000 * var_e12
               |+ CAST(m_e6 AS DECIMAL(38,0)) * num""".stripMargin
          .replace('\n', ' ')).cast("double") /
        expr("""CAST(1000000 AS DECIMAL(38,0))
               |* (n_orders * var_e12 + num)""".stripMargin
          .replace('\n', ' ')).cast("double"), 6))
        .otherwise(col("raw_rate")))
      .select(col("n_name").as("nation"), col("n_orders"), col("x"),
        col("raw_rate"), col("k_strength"), col("prior_mean"),
        col("shrunk_rate"))
      .orderBy("nation")
  }

  val ebShrinkageSql: String =
    """WITH g AS (SELECT c.c_nationkey, count(*) AS n_orders,
      |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS x
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1),
      |gr AS (SELECT *, (2 * x * 1000000 + n_orders) // (2 * n_orders)
      |    AS rate_e6 FROM g),
      |mom AS (SELECT count(*) AS n_groups,
      |    CAST(sum(rate_e6) AS BIGINT) AS sum_r,
      |    CAST(sum(rate_e6 * rate_e6) AS BIGINT) AS sum_r2
      |  FROM gr),
      |mm AS (SELECT n_groups, sum_r, sum_r2,
      |    (2 * sum_r + n_groups) // (2 * n_groups) AS m_e6 FROM mom),
      |mv AS (SELECT *,
      |    CASE WHEN n_groups > 1 THEN
      |      (2 * (sum_r2 - (2 * m_e6 * sum_r - n_groups * m_e6 * m_e6))
      |       + (n_groups - 1)) // (2 * (n_groups - 1)) ELSE 0 END AS var_e12
      |  FROM mm),
      |mk AS (SELECT *, m_e6 * (1000000 - m_e6) - var_e12 AS num,
      |    (var_e12 > 0 AND m_e6 * (1000000 - m_e6) - var_e12 > 0
      |     AND n_groups > 1) AS shrink
      |  FROM mv)
      |SELECT n.n_name AS nation, gr.n_orders, gr.x,
      |  round(CAST(rate_e6 AS DOUBLE) / 1e6, 6) AS raw_rate,
      |  CASE WHEN shrink THEN
      |    round(CAST(num AS DOUBLE) / CAST(var_e12 AS DOUBLE), 6)
      |  ELSE 0.0 END AS k_strength,
      |  round(CAST(m_e6 AS DOUBLE) / 1e6, 6) AS prior_mean,
      |  CASE WHEN shrink THEN round(
      |    CAST(CAST(x AS HUGEINT) * 1000000 * var_e12
      |         + CAST(m_e6 AS HUGEINT) * num AS DOUBLE)
      |    / CAST(CAST(1000000 AS HUGEINT)
      |           * (gr.n_orders * var_e12 + num) AS DOUBLE), 6)
      |  ELSE round(CAST(rate_e6 AS DOUBLE) / 1e6, 6) END AS shrunk_rate
      |FROM gr CROSS JOIN mk
      |JOIN nation n ON gr.c_nationkey = n.n_nationkey
      |ORDER BY nation""".stripMargin
}
