package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Uplift-model evaluation — SURVEY.md §2.337.
  *
  * A/B tests (§2.208/228) answer "did the treatment move the AVERAGE";
  * uplift modeling answers "WHOM should we treat" — rank users by a
  * targeting score, then measure, per score decile, how much larger
  * the treated arm's outcome is than the control arm's (Radcliffe
  * 2007; the Qini curve is the cumulative version read top-decile
  * first). The evaluation needs no model internals, only (score, arm,
  * outcome) per user, which is why it belongs in the engine: the
  * decile table IS the standard offline report for any targeting
  * model, and at 100 TB it must come out of one pass over the logs.
  */
object Uplift {

  /** §2.337 `uplift_deciles`: per score-decile treated/control user
    * counts, mean purchase outcome per arm, the decile uplift, and the
    * cumulative (Qini-style, best-scored-first) uplift — arm = the
    * §2.170 user-parity assignment (randomized by construction),
    * score = the user's click count (a behavioral targeting proxy),
    * outcome = purchase cents.
    *
    * Scale shape: the corpus collapses to the user grain in ONE
    * map-side groupBy; decile boundaries come from INTEGER rank
    * arithmetic over the VALUE-grain click grid (the §2.311
    * convention — no corpus-wide row_number, no single-partition
    * sort; the grid is ≤|distinct click counts| rows and broadcast
    * back); everything after is ≤10-row arithmetic.
    *
    * Determinism: outcomes are exact BIGINT cents; every mean/uplift
    * is a division of integer-valued doubles rounded at 6 dp; empty
    * arms INTEGER-gate to NULL (ANSI-safe); the cumulative window
    * runs over the bounded decile frame on (decile DESC). */
  def upliftDeciles(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val users = ev.groupBy("user_id").agg(
      sum(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("clicks"),
      sum(when(col("event_type") === "purchase",
        expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L))
        .as("cents"))
      .withColumn("arm", (col("user_id") % 2).cast("long"))
    // decile by click count via the integer rank grid (§2.311)
    val wAll = Window.partitionBy(lit(1))
    val wCum = Window.orderBy("clicks")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val deciled = users.groupBy("clicks").agg(count(lit(1)).as("gc"))
      .withColumn("cum_below", sum("gc").over(wCum) - col("gc"))
      .withColumn("n_users", sum("gc").over(wAll))
      .withColumn("decile",
        least(expr("cum_below * 10 div n_users"), lit(9L)))
      .select("clicks", "decile")
    val cells = users.join(broadcast(deciled), "clicks")
      .groupBy("decile").agg(
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_c"),
        sum(when(col("arm") === 1L, col("cents")).otherwise(0L))
          .as("cents_t"),
        sum(when(col("arm") === 0L, col("cents")).otherwise(0L))
          .as("cents_c"))
    def dbl(c: Column): Column = c.cast("double")
    val wDesc = Window.orderBy(col("decile").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val meanT = dbl(col("cents_t")) / 100.0 / dbl(col("n_t"))
    val meanC = dbl(col("cents_c")) / 100.0 / dbl(col("n_c"))
    cells
      // cumulative sums best-scored-first (decile 9 downward): the
      // Qini reading "treat only the top k deciles"
      .withColumn("cum_nt", sum("n_t").over(wDesc))
      .withColumn("cum_nc", sum("n_c").over(wDesc))
      .withColumn("cum_ct", sum("cents_t").over(wDesc))
      .withColumn("cum_cc", sum("cents_c").over(wDesc))
      .withColumn("mean_t", when(col("n_t") > 0L, round(meanT, 6)))
      .withColumn("mean_c", when(col("n_c") > 0L, round(meanC, 6)))
      .withColumn("uplift", when(col("n_t") > 0L && col("n_c") > 0L,
        round(meanT - meanC, 6)))
      .withColumn("cum_uplift",
        when(col("cum_nt") > 0L && col("cum_nc") > 0L, round(
          dbl(col("cum_ct")) / 100.0 / dbl(col("cum_nt")) -
            dbl(col("cum_cc")) / 100.0 / dbl(col("cum_nc")), 6)))
      .select("decile", "n_t", "n_c", "mean_t", "mean_c", "uplift",
        "cum_uplift")
      .orderBy("decile")
  }

  val upliftDecilesSql: String =
    """WITH users AS (SELECT user_id,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS clicks,
      |    CAST(sum(CASE WHEN event_type = 'purchase'
      |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
      |      AS cents,
      |    user_id % 2 AS arm
      |  FROM events GROUP BY 1),
      |grid AS (SELECT clicks, count(*) AS gc FROM users GROUP BY 1),
      |deciled AS (SELECT clicks,
      |    least((CAST(sum(gc) OVER (ORDER BY clicks
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      - gc) * 10 // CAST(sum(gc) OVER () AS BIGINT), 9) AS decile
      |  FROM grid),
      |cells AS (SELECT d.decile,
      |    CAST(sum(CASE WHEN u.arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_t,
      |    CAST(sum(CASE WHEN u.arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_c,
      |    CAST(sum(CASE WHEN u.arm = 1 THEN u.cents ELSE 0 END) AS BIGINT)
      |      AS cents_t,
      |    CAST(sum(CASE WHEN u.arm = 0 THEN u.cents ELSE 0 END) AS BIGINT)
      |      AS cents_c
      |  FROM users u JOIN deciled d ON u.clicks = d.clicks
      |  GROUP BY 1),
      |cum AS (SELECT *,
      |    CAST(sum(n_t) OVER w AS BIGINT) AS cum_nt,
      |    CAST(sum(n_c) OVER w AS BIGINT) AS cum_nc,
      |    CAST(sum(cents_t) OVER w AS BIGINT) AS cum_ct,
      |    CAST(sum(cents_c) OVER w AS BIGINT) AS cum_cc
      |  FROM cells
      |  WINDOW w AS (ORDER BY decile DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT decile, n_t, n_c,
      |  CASE WHEN n_t > 0 THEN
      |    round(CAST(cents_t AS DOUBLE) / 100.0 / CAST(n_t AS DOUBLE), 6)
      |    END AS mean_t,
      |  CASE WHEN n_c > 0 THEN
      |    round(CAST(cents_c AS DOUBLE) / 100.0 / CAST(n_c AS DOUBLE), 6)
      |    END AS mean_c,
      |  CASE WHEN n_t > 0 AND n_c > 0 THEN round(
      |    CAST(cents_t AS DOUBLE) / 100.0 / CAST(n_t AS DOUBLE)
      |    - CAST(cents_c AS DOUBLE) / 100.0 / CAST(n_c AS DOUBLE), 6)
      |    END AS uplift,
      |  CASE WHEN cum_nt > 0 AND cum_nc > 0 THEN round(
      |    CAST(cum_ct AS DOUBLE) / 100.0 / CAST(cum_nt AS DOUBLE)
      |    - CAST(cum_cc AS DOUBLE) / 100.0 / CAST(cum_nc AS DOUBLE), 6)
      |    END AS cum_uplift
      |FROM cum ORDER BY decile""".stripMargin
}
