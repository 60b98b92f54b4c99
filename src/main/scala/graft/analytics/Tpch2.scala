package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** TPC-H family, second batch — SURVEY.md §2 items 182–192.
  *
  * Completes the 22-query decision-support suite (§2.8/103/163–167/
  * 176/177 cover Q1/Q18/Q7/Q10/Q14/Q17/Q2/Q15/Q22; §2.42 Q5, §2.43
  * Q20-ish). The star schema here has no partsupp table and no
  * commit/receipt/shipmode columns, so each query keeps its CLASS —
  * the plan shape the optimizer must get right (semi-join
  * decorrelation, scalar-subquery broadcast, disjunctive pushdown,
  * outer-join histogram, multi-EXISTS) — with predicates adapted to
  * the columns that exist (lateness = l_shipdate vs o_orderdate;
  * supply cost proxied by p_retailprice).
  *
  * Scale conventions as in [[Tpch]]: nation/region always broadcast;
  * part/supplier broadcast at test SF and degrade to key-partitioned
  * shuffles at 100 TB; selective predicates verified pushed into the
  * parquet scans; double sums rounded 4 dp (inputs are exact cents —
  * engine partial-agg order noise is ~1e-10, far under the grid).
  */
object Tpch2 {

  /** §2.182 TPC-H Q4 shape (order-priority checking): orders in 1997H1
    * with at least one lineitem shipped >30 days after the order date
    * (the lateness proxy for commit<receipt), counted by priority.
    * The EXISTS is a LEFT SEMI join with a cross-side inequality —
    * the fact side shuffles once on orderkey, lineitem is pruned to
    * (orderkey, shipdate) at the scan, and the semi join short-circuits
    * per order (no per-order count materialized). */
  def q4Priority(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate").between(lit("1997-01-01"), lit("1997-06-30")))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_shipdate"))
    ord.join(li, ord("o_orderkey") === li("l_orderkey") &&
        li("l_shipdate") > ord("o_orderdate") + expr("INTERVAL 30 DAY"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q4PrioritySql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
      |                      AND TIMESTAMP '1997-06-30 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** §2.183 TPC-H Q6 shape (forecasting revenue change): one scan, no
    * join — the canonical filter-pushdown showcase. All three
    * predicates (date window, discount band, quantity cap) must reach
    * the parquet reader as PushedFilters (spec-asserted); the agg is a
    * single map-side-combined global sum. At 100 TB this query IS its
    * scan: row-group statistics skip everything outside the 1997 date
    * range when the data is ship-date-sorted (§2.78). */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24.0)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4)
        .as("revenue"), count(lit(1)).as("n_items"))

  val q6ForecastSql: String =
    """SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24.0""".stripMargin

  /** §2.184 TPC-H Q8 shape (national market share): NATION_7's share of
    * STANDARD-part revenue sold to ASIA-region customers, by year.
    * Five dims fold onto one fact pass: part (type filter, semi-
    * reducing), customer⋈nation⋈region (region filter pre-joined into
    * a broadcast customer slice), supplier⋈nation (the share
    * discriminator). Numerator/denominator come from ONE conditional
    * aggregate — never two passes. Both sums round 4 dp before the
    * 6 dp ratio: the ratio of two on-grid values is engine-order-free. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val nat = Tables.nation(spark, dir)
    val asiaCust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      .join(broadcast(nat.join(
          broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cn_key"))),
        col("c_nationkey") === col("cn_key"))
      .select("c_custkey")
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(nat.select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .select("s_suppkey", "supp_nation")
    val stdParts = Tables.part(spark, dir)
      .filter(col("p_type") === "STANDARD").select("p_partkey")
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(stdParts), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        round(sum(when(col("supp_nation") === "NATION_7",
            col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .otherwise(lit(0.0))), 4).as("nation_revenue"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("total_revenue"))
      .withColumn("mkt_share",
        round(col("nation_revenue") / col("total_revenue"), 6))
      .orderBy("o_year")
  }

  val q8MarketShareSql: String =
    """SELECT o_year, nation_revenue, total_revenue,
      |  round(nation_revenue / total_revenue, 6) AS mkt_share
      |FROM (
      |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |    round(sum(CASE WHEN n2.n_name = 'NATION_7'
      |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END), 4)
      |      AS nation_revenue,
      |    round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS total_revenue
      |  FROM lineitem
      |  JOIN part     ON l_partkey = p_partkey
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region   ON n1.n_regionkey = r_regionkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
      |  GROUP BY 1) t
      |ORDER BY o_year""".stripMargin

  /** §2.185 TPC-H Q9 shape (product-type profit): profit on widget
    * parts by supplier nation and ship year, supply cost proxied as
    * 60% of p_retailprice (no partsupp table). The p_name LIKE filter
    * semi-reduces the fact before any wide join. Profit addends are
    * exact 4-decimal values (cents × 2-dp discounts), so they convert
    * LOSSLESSLY to integer ten-thousandths per row and SUM AS LONGS —
    * exact, overflow-safe to ~1e14 rows, and engine-order-free, where
    * any double rounding would hit x.xx50 ties that FP noise breaks
    * differently per engine (observed: 3.4% of groups flipped). */
  def q9ProfitShare(spark: SparkSession, dir: String): DataFrame = {
    val widget = Tables.part(spark, dir)
      .filter(col("p_name").like("%widget%"))
      .select("p_partkey", "p_retailprice")
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name").as("nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "nation")
    Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
        "l_discount", "l_shipdate")
      .join(broadcast(widget), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .select(col("nation"), year(col("l_shipdate")).as("o_year"),
        round((col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
          lit(0.6) * col("p_retailprice") * col("l_quantity")) * 10000.0, 0)
          .cast("long").as("amount_i"))
      .groupBy("nation", "o_year")
      .agg(round(sum("amount_i") / 10000.0, 4).as("sum_profit"))
      .orderBy(asc("nation"), desc("o_year"))
  }

  val q9ProfitShareSql: String =
    """SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS o_year,
      |  round(sum(CAST(round((l_extendedprice * (1.0 - l_discount)
      |    - 0.6 * p_retailprice * l_quantity) * 10000.0, 0) AS BIGINT))
      |    / 10000.0, 4) AS sum_profit
      |FROM lineitem
      |JOIN part     ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%widget%'
      |GROUP BY 1, 2
      |ORDER BY nation, o_year DESC""".stripMargin

  /** §2.186 TPC-H Q11 shape (important stock): per-part shipped value
    * from AFRICA-region suppliers, keeping parts above a fraction of
    * the total — the scalar-subquery-broadcast pattern: the threshold
    * is a 1-row aggregate of the SAME part-grain frame (computed once,
    * reused via a broadcast cross join, no second fact pass), and the
    * HAVING filter runs at part grain, never on the fact. */
  def q11ImportantStock(spark: SparkSession, dir: String): DataFrame = {
    val afrSupp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.nation(spark, dir)
          .join(broadcast(Tables.region(spark, dir)
            .filter(col("r_name") === "AFRICA")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"), "left_semi")
      .select("s_suppkey")
    val partVal = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice")
      .join(broadcast(afrSupp), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey").as("partkey"))
      .agg(round(sum("l_extendedprice"), 4).as("value"))
    val threshold = partVal.agg((sum("value") * 0.0005).as("thr"))
    partVal.crossJoin(broadcast(threshold))
      .filter(col("value") > col("thr"))
      .select("partkey", "value")
      .orderBy(desc("value"), asc("partkey"))
  }

  val q11ImportantStockSql: String =
    """WITH pv AS (
      |  SELECT l_partkey AS partkey, round(sum(l_extendedprice), 4) AS value
      |  FROM lineitem
      |  WHERE l_suppkey IN (
      |    SELECT s_suppkey FROM supplier
      |    JOIN nation ON s_nationkey = n_nationkey
      |    JOIN region ON n_regionkey = r_regionkey
      |    WHERE r_name = 'AFRICA')
      |  GROUP BY l_partkey)
      |SELECT partkey, value FROM pv
      |WHERE value > (SELECT sum(value) * 0.0005 FROM pv)
      |ORDER BY value DESC, partkey""".stripMargin

  /** §2.187 TPC-H Q12 shape (shipping-mode priority): no shipmode
    * column, so the classes are ship-latency buckets (late = shipped
    * >60 days after ordering); per bucket, high-priority (URGENT/HIGH)
    * vs low-priority order-line counts. ONE orderkey join + one
    * conditional aggregate to 2 rows — the late-shipment SLA report. */
  def q12ShipPriority(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .select("l_orderkey", "l_shipdate")
      .join(Tables.orders(spark, dir)
        .select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("ship_class",
        when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"),
          "LATE").otherwise("ONTIME"))
      .groupBy("ship_class")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy("ship_class")

  val q12ShipPrioritySql: String =
    """SELECT
      |  CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
      |    THEN 'LATE' ELSE 'ONTIME' END AS ship_class,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1 ORDER BY ship_class""".stripMargin

  /** §2.188 TPC-H Q13 shape (customer order distribution): the
    * outer-join histogram — how many customers placed exactly k
    * qualifying orders, INCLUDING the zero bucket (the rows an inner
    * join would silently drop; that's the point of the query). Orders
    * pre-filtered at the scan, LEFT join from customer, two stacked
    * aggregations: customer grain (count of non-null orderkeys — nulls
    * from the outer join count 0) then count grain. Both aggs map-side
    * combine; the second input is customer-sized, the histogram
    * |distinct counts|-sized. */
  def q13CustDist(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .select("o_orderkey", "o_custkey")
    Tables.customer(spark, dir).select("c_custkey")
      .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  val q13CustDistSql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      |  GROUP BY c_custkey) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** §2.189 TPC-H Q16 shape (parts/supplier relationship): distinct
    * suppliers per (brand, type, size) for small non-Brand#1 parts,
    * excluding "complaint" suppliers (acctbal < 0 — the comment-LIKE
    * proxy) via an ANTI join applied BEFORE the distinct aggregation.
    * The part filters prune at the scan; the exclusion list is
    * supplier-sized and broadcast; count(DISTINCT) shuffles only the
    * filtered (brand, type, size, suppkey) projection. */
  def q16SupplierCnt(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#1" && col("p_size") <= 10)
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val complaints = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0.0).select("s_suppkey")
    Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey")
      .join(broadcast(complaints),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"), asc("p_size"))
  }

  val q16SupplierCntSql: String =
    """SELECT p_brand, p_type, p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1' AND p_size <= 10
      |  AND l_suppkey NOT IN (
      |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** §2.190 TPC-H Q19 shape (discounted revenue, disjunctive
    * predicates): three (brand × size-band × quantity-band) disjuncts
    * across the lineitem⋈part join — the OR-of-ANDs class. The
    * single-side conjuncts each disjunct shares (quantity ≥ 1, size
    * bands union to 1..50) stay pushable; the cross-side disjunction
    * evaluates post-join as one codegen'd predicate, never as three
    * unioned passes. */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val part = Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
          col("l_quantity").between(1.0, 15.0)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(11, 25) &&
          col("l_quantity").between(10.0, 25.0)) ||
        (col("p_brand") === "Brand#4" && col("p_size").between(26, 50) &&
          col("l_quantity").between(20.0, 35.0)))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
        .as("revenue"), count(lit(1)).as("n_items"))
  }

  val q19DisjunctiveSql: String =
    """SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
      |       AND l_quantity BETWEEN 1.0 AND 15.0)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 11 AND 25
      |       AND l_quantity BETWEEN 10.0 AND 25.0)
      |   OR (p_brand = 'Brand#4' AND p_size BETWEEN 26 AND 50
      |       AND l_quantity BETWEEN 20.0 AND 35.0)""".stripMargin

  /** §2.191 TPC-H Q20 shape (potential part promotion): suppliers who
    * DOMINATED at least one PROMO part in 1997 — shipped more than
    * half that part's year volume (the availqty>0.5·sum test without a
    * partsupp table). Two stacked aggregates over ONE fact slice
    * ((part,supp) grain, then part grain joined back at part grain —
    * both map-side combined), then a supplier-grain distinct and a
    * broadcast name/nation decoration. Nothing after the first groupBy
    * is data-proportional. */
  def q20PromoSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val promo = Tables.part(spark, dir)
      .filter(col("p_type") === "PROMO").select("p_partkey")
    val sp = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(broadcast(promo), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum("l_quantity").as("supp_qty"))
    val pt = sp.groupBy(col("l_partkey").as("t_partkey"))
      .agg(sum("supp_qty").as("part_qty"))
    val dominant = sp.join(pt, col("l_partkey") === col("t_partkey"))
      .filter(col("supp_qty") > col("part_qty") * 0.5)
      .select("l_suppkey").distinct()
    dominant
      .join(broadcast(Tables.supplier(spark, dir)
        .select("s_suppkey", "s_name", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "n_name")
      .orderBy("s_suppkey")
  }

  val q20PromoSuppliersSql: String =
    """WITH sp AS (
      |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
      |  GROUP BY 1, 2),
      |pt AS (SELECT l_partkey, sum(supp_qty) AS part_qty FROM sp GROUP BY 1)
      |SELECT DISTINCT s_suppkey, s_name, n_name
      |FROM sp
      |JOIN pt USING (l_partkey)
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE supp_qty > part_qty * 0.5
      |ORDER BY s_suppkey""".stripMargin

  /** §2.192 TPC-H Q21 shape (suppliers who kept orders waiting): on
    * finished multi-supplier orders, the supplier who was the ONLY
    * late shipper (late = shipped >60 days after ordering), counted
    * and ranked. The classic EXISTS + NOT-EXISTS double self-join is
    * DECORRELATED into one per-order aggregate (distinct suppliers,
    * distinct late suppliers — both from the same orderkey-grain
    * pass) joined back to the late lines: three orderkey-co-partitioned
    * shuffles total, no correlated per-row probes, no self-join
    * explosion on big orders. Top 20 by TakeOrdered. */
  def q21WaitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val lo = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(Tables.orders(spark, dir)
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
    val perOrder = lo.groupBy(col("l_orderkey").as("g_orderkey"))
      .agg(countDistinct("l_suppkey").as("n_supps"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("n_late"))
      .filter(col("n_supps") > 1 && col("n_late") === 1)
    lo.filter(col("late"))
      .join(perOrder, col("l_orderkey") === col("g_orderkey"), "left_semi")
      .select("l_orderkey", "l_suppkey").distinct()
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(spark, dir)
        .select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select("s_name", "numwait")
      .orderBy(desc("numwait"), asc("s_name"))
      .limit(20)
  }

  val q21WaitingSuppliersSql: String =
    """WITH lo AS (
      |  SELECT l_orderkey, l_suppkey,
      |    l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F'),
      |po AS (
      |  SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supps,
      |    count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
      |  FROM lo GROUP BY 1)
      |SELECT s_name, count(*) AS numwait
      |FROM (SELECT DISTINCT lo.l_orderkey, lo.l_suppkey
      |      FROM lo JOIN po USING (l_orderkey)
      |      WHERE lo.late AND po.n_supps > 1 AND po.n_late = 1) w
      |JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin
}
