package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Window-frame / reshaping operators — SURVEY.md §2.270–274.
  *
  * The round-8 engine-completeness batch: calendar RANGE frames,
  * distribution ranks, exact distributed weighted median, per-group
  * ABC (Pareto-class) analysis, and relational unpivot. Every op
  * carries exact integer cents/counts to a single final division
  * (the cross-engine determinism rule), and the only floats emitted
  * are one-division ratios rounded once.
  */
object Frames {

  private def cents(colName: String) =
    expr(s"CAST(round($colName * 100) AS BIGINT)")

  /** §2.270 `trailing_30d_revenue`: per order, the customer's trailing
    * 30-day (inclusive) revenue and order count via a RANGE frame over
    * an integer day index — the calendar-window family `rowsBetween`
    * cannot express (a customer with 3 orders in one day and none for
    * a month needs a frame keyed on TIME, not row offsets). The
    * running-spend feature online fraud / credit models join as-of.
    *
    * Scale shape: ONE o_custkey exchange + per-customer sort; the
    * RANGE frame is evaluated in that sort order with a sliding
    * accumulator (no per-row rescan); output is order-grain. Peers
    * (same customer, same day) share a frame by definition, so the
    * result is partition-order-free.
    *
    * Determinism: day index and cents are exact integers; no floats
    * anywhere. */
  def trailing30dRevenue(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
          .cast("long").as("day"),
        cents("o_totalprice").as("c"))
    val w = Window.partitionBy("o_custkey").orderBy("day")
      .rangeBetween(-29, 0)
    o.select(col("o_orderkey"), col("o_custkey"), col("day"),
        sum("c").over(w).as("trailing_cents"),
        count(lit(1)).over(w).as("n_orders_30d"))
      .orderBy("o_orderkey")
  }

  val trailing30dRevenueSql: String =
    """SELECT o_orderkey, o_custkey, day,
      |  CAST(sum(c) OVER w AS BIGINT) AS trailing_cents,
      |  count(*) OVER w AS n_orders_30d
      |FROM (SELECT o_orderkey, o_custkey,
      |    CAST(date_diff('day', DATE '1970-01-01',
      |      CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS c
      |  FROM orders) t
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY day
      |  RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
      |ORDER BY o_orderkey""".stripMargin

  /** §2.271 `value_ranks`: percent_rank and cume_dist of every
    * DISTINCT event value per event type — the empirical-CDF lookup
    * table ("this $42.50 click is at the 93rd percentile of clicks")
    * that inverts §2.15's fixed-quantile report. Emitted at
    * value-grain, NOT event-grain: the table is bounded by value
    * cardinality and joins back to the stream as a broadcast.
    *
    * Scale shape: one map-side-combined groupBy to (type, cents)
    * cells, then two running sums over the per-type value order (a
    * |values|-sized frame, not the corpus).
    *
    * Determinism: rank arithmetic on exact integer counts —
    * percent_rank = rows-strictly-below / (N−1), cume_dist = rows-≤ /
    * N, each ONE division of identical integers, rounded once at
    * 6 dp. Ties are merged by construction (one row per value), so no
    * tie-break ordering exists to diverge. */
  def valueRanks(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(spark, dir)
      .select(col("event_type"), cents("value").as("cents"))
      .groupBy("event_type", "cents").agg(count(lit(1)).as("n"))
    val wCum = Window.partitionBy("event_type").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("event_type")
    cells
      .withColumn("cum", sum("n").over(wCum))
      .withColumn("tot", sum("n").over(wAll))
      .select(col("event_type"), col("cents"), col("n"),
        // tot=1 degenerate: ANSI Spark errors on the 0/0 where DuckDB
        // yields NULL — integer-gate the division (NULL on both engines)
        round(when(col("tot") > 1,
          (col("cum") - col("n")).cast("double") / (col("tot") - 1)), 6)
          .as("pct_rank"),
        round(col("cum").cast("double") / col("tot"), 6).as("cume_dist"))
      .orderBy("event_type", "cents")
  }

  val valueRanksSql: String =
    """SELECT event_type, cents, n,
      |  round(CASE WHEN tot > 1
      |    THEN CAST(cum - n AS DOUBLE) / (tot - 1) END, 6) AS pct_rank,
      |  round(CAST(cum AS DOUBLE) / tot, 6) AS cume_dist
      |FROM (SELECT event_type, cents, n,
      |    CAST(sum(n) OVER (PARTITION BY event_type ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cum,
      |    CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS tot
      |  FROM (SELECT event_type,
      |      CAST(round(value * 100) AS BIGINT) AS cents, count(*) AS n
      |    FROM events GROUP BY 1, 2) c) r
      |ORDER BY event_type, cents""".stripMargin

  /** §2.272 `weighted_median`: exact distributed weighted median —
    * per return flag, the smallest lineitem price whose cumulative
    * QUANTITY weight reaches half the total (lower weighted median,
    * stated convention). The "median unit sold for" number an
    * unweighted §2.3 median gets wrong whenever cheap items ship in
    * bulk. NO collect: this is the cumulative-weight-over-sorted-
    * values algorithm, the same machinery at any scale.
    *
    * Scale shape: one groupBy to (flag, cents) cells (map-side
    * combine eats the corpus), one |values|-sized running sum per
    * flag, one conditional min. Output = |flags| rows.
    *
    * Determinism: the median is selected by an ALL-INTEGER
    * comparison (2·cum ≥ tot — no float half-point), weights are
    * exact integer quantities. */
  def weightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        cents("l_extendedprice").as("cents"),
        col("l_quantity").cast("long").as("w"))
      .groupBy("l_returnflag", "cents").agg(sum("w").as("ws"))
    val wCum = Window.partitionBy("l_returnflag").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("l_returnflag")
    cells
      .withColumn("cum", sum("ws").over(wCum))
      .withColumn("tot", sum("ws").over(wAll))
      .groupBy("l_returnflag")
      .agg(min(when(col("cum") * 2 >= col("tot"), col("cents")))
          .as("wmedian_cents"),
        count(lit(1)).as("n_values"), max("tot").as("total_weight"))
      .orderBy("l_returnflag")
  }

  val weightedMedianSql: String =
    """SELECT l_returnflag,
      |  min(CASE WHEN cum * 2 >= tot THEN cents END) AS wmedian_cents,
      |  count(*) AS n_values,
      |  CAST(max(tot) AS BIGINT) AS total_weight
      |FROM (SELECT l_returnflag, cents,
      |    CAST(sum(ws) OVER (PARTITION BY l_returnflag ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cum,
      |    CAST(sum(ws) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot
      |  FROM (SELECT l_returnflag,
      |      CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
      |      CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ws
      |    FROM lineitem GROUP BY 1, 2) c) r
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** §2.273 `abc_analysis`: per market segment, customers ranked by
    * lifetime revenue into the classic A/B/C inventory classes —
    * A carries the first 80% of segment revenue, B to 95%, C the
    * tail — the per-GROUP Pareto classification §2.206's global
    * report can't give (every segment has its own head). Output is
    * the segment×class rollup a planner reads.
    *
    * Scale shape: orders fold to customer grain first (map-side
    * combine), the segment decoration is a custkey-grain
    * shuffle-hash join (customer is DATA-PROPORTIONAL — pinned, the
    * §6 round-5 broadcast trap), the rank/cumsum windows run per
    * segment over the customer-grain frame, and the final rollup is
    * segments×3 rows.
    *
    * Determinism: class boundaries are ALL-INTEGER comparisons
    * (cum·10 ≤ tot·8, cum·20 ≤ tot·19 — no float share crosses a
    * boundary), ties broken by custkey; shares are one division
    * rounded once. */
  def abcAnalysis(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .select(col("o_custkey"), cents("o_totalprice").as("c"))
      .groupBy("o_custkey").agg(sum("c").as("cents"))
    val seg = Tables.customer(spark, dir)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val ranked = perCust.hint("shuffle_hash").join(seg, "o_custkey")
    val wCum = Window.partitionBy("c_mktsegment")
      .orderBy(col("cents").desc, col("o_custkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("c_mktsegment")
    ranked
      .withColumn("cum", sum("cents").over(wCum))
      .withColumn("tot", sum("cents").over(wAll))
      .withColumn("abc_class",
        when(col("cum") * 10 <= col("tot") * 8, "A")
          .when(col("cum") * 20 <= col("tot") * 19, "B")
          .otherwise("C"))
      .groupBy("c_mktsegment", "abc_class")
      .agg(count(lit(1)).as("n_customers"), sum("cents").as("class_cents"),
        max("tot").as("tot"))
      .select(col("c_mktsegment"), col("abc_class"), col("n_customers"),
        col("class_cents"),
        round(col("class_cents").cast("double") / col("tot"), 6)
          .as("revenue_share"))
      .orderBy("c_mktsegment", "abc_class")
  }

  val abcAnalysisSql: String =
    """WITH pc AS (SELECT o_custkey,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1),
      |r AS (SELECT c.c_mktsegment, pc.cents,
      |    CAST(sum(pc.cents) OVER (PARTITION BY c.c_mktsegment
      |      ORDER BY pc.cents DESC, pc.o_custkey ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cum,
      |    CAST(sum(pc.cents) OVER (PARTITION BY c.c_mktsegment)
      |      AS BIGINT) AS tot
      |  FROM pc JOIN customer c ON pc.o_custkey = c.c_custkey),
      |cl AS (SELECT c_mktsegment,
      |    CASE WHEN cum * 10 <= tot * 8 THEN 'A'
      |      WHEN cum * 20 <= tot * 19 THEN 'B' ELSE 'C' END AS abc_class,
      |    cents, tot
      |  FROM r)
      |SELECT c_mktsegment, abc_class, count(*) AS n_customers,
      |  CAST(sum(cents) AS BIGINT) AS class_cents,
      |  round(CAST(sum(cents) AS DOUBLE) / max(tot), 6) AS revenue_share
      |FROM cl GROUP BY 1, 2 ORDER BY c_mktsegment, abc_class""".stripMargin

  /** §2.274 `unpivot_metrics`: relational melt — the per-type wide
    * aggregate (count / sum / min / max of integer cents) unpivoted
    * to (event_type, metric, value) long form via the native
    * `Dataset.unpivot` (Spark's UNPIVOT/MELT relational operator,
    * `Expand` under the hood — the inverse of §2.12's pivot). The
    * long form is what metric stores and generic dashboards ingest.
    *
    * Scale shape: the corpus collapses to |types| wide rows BEFORE
    * the unpivot; Expand multiplies rows AFTER aggregation (types×4),
    * never the corpus.
    *
    * Determinism: all four metrics are exact integers sharing one
    * BIGINT value column; no floats. */
  def unpivotMetrics(spark: SparkSession, dir: String): DataFrame = {
    val wide = Tables.events(spark, dir)
      .select(col("event_type"), cents("value").as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum("c").as("sum_cents"),
        min("c").as("min_cents"), max("c").as("max_cents"))
    wide.unpivot(
        Array(col("event_type")),
        Array(col("n_events"), col("sum_cents"), col("min_cents"),
          col("max_cents")),
        "metric", "value")
      .orderBy("event_type", "metric")
  }

  val unpivotMetricsSql: String =
    """WITH wide AS (SELECT event_type, count(*) AS n_events,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |      AS sum_cents,
      |    min(CAST(round(value * 100) AS BIGINT)) AS min_cents,
      |    max(CAST(round(value * 100) AS BIGINT)) AS max_cents
      |  FROM events GROUP BY 1)
      |SELECT event_type, metric, value FROM (
      |  UNPIVOT wide ON n_events, sum_cents, min_cents, max_cents
      |  INTO NAME metric VALUE value)
      |ORDER BY event_type, metric""".stripMargin
}
