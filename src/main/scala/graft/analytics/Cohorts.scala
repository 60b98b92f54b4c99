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

  /** §2.226 `cohort_ltv`: cumulative lifetime value per acquisition
    * cohort — customers cohorted by the YEAR of their first order,
    * revenue accumulated by year offset, reported per cohort cell as
    * total revenue, cumulative revenue, and cumulative LTV per
    * cohort customer — the money-grain sibling of the §2.170/§2.111
    * retention counts (finance asks "what is a 1995 customer worth
    * by year 3?", not "did they come back?").
    *
    * Scale shape: one groupBy(custkey) for first-order year, one
    * custkey-co-located join back (the cohortMatrix shuffle
    * discipline), then a map-side-combined rollup to ≤ years² cells;
    * the cumulative window runs per cohort over that bounded frame.
    * Cohort sizes join back from the first-order frame (dim-sized).
    *
    * Determinism: revenue is carried as exact BIGINT cents from the
    * row level (the §2.141 rule) — cell sums, cumulative sums, and
    * the final per-customer division are all identical-integer
    * arithmetic. */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), year(col("o_orderdate")).as("yr"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val firstYr = o.groupBy("o_custkey").agg(min("yr").as("cohort_year"))
    val sizes = firstYr.groupBy("cohort_year")
      .agg(count(lit(1)).as("n_customers"))
    val cells = o.join(firstYr, "o_custkey")
      .withColumn("year_offset", (col("yr") - col("cohort_year")).cast("int"))
      .groupBy("cohort_year", "year_offset")
      .agg(sum("cents").as("rev_cents"))
    val w = Window.partitionBy("cohort_year").orderBy("year_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_cents", sum("rev_cents").over(w))
      .join(broadcast(sizes), Seq("cohort_year"))
      .select(col("cohort_year"), col("year_offset"), col("n_customers"),
        round(col("rev_cents").cast("double") / 100.0, 2).as("revenue"),
        round(col("cum_cents").cast("double") / 100.0, 2).as("cum_revenue"),
        round(col("cum_cents").cast("double") / 100.0 / col("n_customers"), 4)
          .as("cum_ltv_per_customer"))
      .orderBy("cohort_year", "year_offset")
  }

  val cohortLtvSql: String =
    """WITH o AS (SELECT o_custkey, year(o_orderdate) AS yr,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
      |fy AS (SELECT o_custkey, min(yr) AS cohort_year FROM o GROUP BY 1),
      |sz AS (SELECT cohort_year, count(*) AS n_customers FROM fy GROUP BY 1),
      |cells AS (SELECT f.cohort_year,
      |    CAST(o.yr - f.cohort_year AS INT) AS year_offset,
      |    CAST(sum(o.cents) AS BIGINT) AS rev_cents
      |  FROM o JOIN fy f ON o.o_custkey = f.o_custkey
      |  GROUP BY 1, 2),
      |cum AS (SELECT cohort_year, year_offset, rev_cents,
      |    CAST(sum(rev_cents) OVER (PARTITION BY cohort_year
      |      ORDER BY year_offset
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_cents
      |  FROM cells)
      |SELECT c.cohort_year, c.year_offset, sz.n_customers,
      |  round(CAST(c.rev_cents AS DOUBLE) / 100.0, 2) AS revenue,
      |  round(CAST(c.cum_cents AS DOUBLE) / 100.0, 2) AS cum_revenue,
      |  round(CAST(c.cum_cents AS DOUBLE) / 100.0 / sz.n_customers, 4)
      |    AS cum_ltv_per_customer
      |FROM cum c JOIN sz USING (cohort_year)
      |ORDER BY c.cohort_year, c.year_offset""".stripMargin
}
