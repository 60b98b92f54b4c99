package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** TPC-H-family analytics — SURVEY.md §2 items 163–167.
  *
  * The reference's dashboard layer (README.md "Report Visualization")
  * stops at single-table aggregates; these close the classic multi-join
  * decision-support shapes over the same star schema: nation-pair trade
  * volume (Q7), returned-item ranking (Q10), promo revenue share (Q14),
  * small-quantity revenue loss (Q17), and min-cost supplier (Q2).
  *
  * Scale notes: every query broadcasts the true dimensions (nation ≤25
  * rows, supplier |S| ≈ |L|/600, part |P| ≈ |L|/30 — broadcast here at
  * test SF; at 100 TB part/supplier degrade gracefully to shuffle joins
  * on their keys while nation stays broadcast) and pushes the selective
  * filters (returnflag, date window, brand) into the parquet scan before
  * any shuffle. Q17's correlated subquery is decorrelated into one
  * per-part aggregate joined back — two passes over the brand-filtered
  * slice, never over the full fact table.
  */
object Tpch {

  /** §2.163 TPC-H Q7 shape: trade volume between distinct nation pairs
    * by year. lineitem⋈orders⋈customer + lineitem⋈supplier, nation
    * broadcast twice under different aliases. */
  def q7Volume(spark: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.nation(spark, dir).select(
      col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir).select(
      col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate").between(lit("1996-01-01"), lit("1997-12-31")))
      .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    li.join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
        .as("revenue"))
      .filter(col("revenue") > 1000.0)
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7VolumeSql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS INT) AS l_year,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey  = c_custkey
      |JOIN supplier ON l_suppkey  = s_suppkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
      |                     AND TIMESTAMP '1997-12-31 00:00:00'
      |  AND n1.n_name <> n2.n_name
      |GROUP BY 1, 2, 3
      |HAVING round(sum(l_extendedprice * (1.0 - l_discount)), 4) > 1000.0
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** §2.164 TPC-H Q10 shape: top 20 customers by revenue lost to
    * returned items in one quarter. The returnflag + date filters reach
    * the scans; customer⋈nation broadcast onto the aggregated fact. */
  def q10Returned(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate").between(lit("1997-01-01"), lit("1997-06-30")))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val nat = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"))
    val cust = Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
        .as("revenue"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        round(col("c_acctbal"), 4).as("acctbal"), col("n_name"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(20)
  }

  val q10ReturnedSql: String =
    """SELECT c_custkey, c_name,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
      |  round(c_acctbal, 4) AS acctbal, n_name
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey  = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
      |                      AND TIMESTAMP '1997-06-30 00:00:00'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** §2.165 TPC-H Q14 shape: promo revenue share by ship month. One
    * conditional aggregate over lineitem⋈part — part broadcast at test
    * SF (|P| = |L|/30; at extreme scale this becomes a shuffle join on
    * l_partkey with the same plan shape). */
  def q14Promo(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir).select("p_partkey", "p_type")
    Tables.lineitem(spark, dir)
      .select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(date_trunc("month", col("l_shipdate")).as("ship_month"))
      .agg(
        round(sum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .otherwise(lit(0.0))), 4).as("promo_revenue"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("total_revenue"))
      .withColumn("promo_pct",
        round(col("promo_revenue") * 100.0 / col("total_revenue"), 4))
      .orderBy("ship_month")
  }

  val q14PromoSql: String =
    """SELECT ship_month, promo_revenue, total_revenue,
      |  round(promo_revenue * 100.0 / total_revenue, 4) AS promo_pct
      |FROM (
      |  SELECT date_trunc('month', l_shipdate) AS ship_month,
      |    round(sum(CASE WHEN p_type = 'PROMO'
      |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END), 4)
      |      AS promo_revenue,
      |    round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS total_revenue
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1) t
      |ORDER BY ship_month""".stripMargin

  /** §2.166 TPC-H Q17 shape: revenue loss if small-quantity orders for
    * one brand were dropped. The correlated `l_quantity < 0.5 * avg per
    * part` subquery is decorrelated: the brand semi-join narrows
    * lineitem first, the per-part avg is one aggregate over that slice
    * joined back (broadcast — it is |parts-of-brand| rows). */
  def q17SmallQty(spark: SparkSession, dir: String): DataFrame = {
    val brandParts = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#1").select("p_partkey")
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
    val avgQty = li.groupBy(col("p_partkey").as("a_partkey"))
      .agg(avg("l_quantity").as("avg_qty"))
    li.join(broadcast(avgQty), col("l_partkey") === col("a_partkey"))
      .filter(col("l_quantity") < col("avg_qty") * 0.5)
      .agg(round(sum(col("l_extendedprice")) / 7.0, 4).as("avg_yearly"),
        count(lit(1)).as("n_small"))
  }

  val q17SmallQtySql: String =
    """SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly,
      |  count(*) AS n_small
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_brand = 'Brand#1'
      |  AND l_quantity < (
      |    SELECT 0.5 * avg(l_quantity) FROM lineitem l2
      |    WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin

  /** §2.167 TPC-H Q2 shape: min-cost supplier per part. The per-part
    * argmin is ONE shuffle via min_by on a (unit_cost, suppkey) struct
    * — no window, no join-back for the winner row; supplier/nation
    * broadcast onto the 1-row-per-part result. */
  def q2MinCost(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir)
      .filter(col("p_type") === "ECONOMY")
      .select("p_partkey", "p_name")
    val nat = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    val supp = Tables.supplier(spark, dir)
      .select("s_suppkey", "s_name", "s_nationkey")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
    // HALF-UP integer e6-dollar unit cost: the float division rounded
    // 6 dp landed exactly on .5e-6 boundaries at sf1 where Spark's
    // HALF_UP and DuckDB's half-even disagree (first committed sf1
    // oracle run, 0.03% of parts) — cents·10⁴/qty as exact BIGINTs
    val best = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        (expr("""(2 * CAST(round(l_extendedprice * 100) AS BIGINT) * 10000
                | + CAST(l_quantity AS BIGINT))
                | div (2 * CAST(l_quantity AS BIGINT))"""
          .stripMargin.replace('\n', ' ')).cast("double") / 1e6)
          .as("unit_cost"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy("p_partkey", "p_name")
      .agg(min(struct(col("unit_cost"), col("l_suppkey"))).as("w"))
      .select(col("p_partkey"), col("p_name"),
        col("w.unit_cost").as("min_unit_cost"),
        col("w.l_suppkey").as("best_suppkey"))
    best.join(broadcast(supp), col("best_suppkey") === col("s_suppkey"))
      .select("p_partkey", "p_name", "min_unit_cost", "s_name", "n_name")
      .orderBy("p_partkey")
  }

  val q2MinCostSql: String =
    """WITH ranked AS (
      |  SELECT p_partkey, p_name,
      |    CAST((2 * CAST(round(l_extendedprice * 100) AS BIGINT) * 10000
      |        + CAST(l_quantity AS BIGINT))
      |      // (2 * CAST(l_quantity AS BIGINT)) AS DOUBLE) / 1e6
      |      AS unit_cost, l_suppkey,
      |    row_number() OVER (PARTITION BY p_partkey
      |      ORDER BY (2 * CAST(round(l_extendedprice * 100) AS BIGINT)
      |          * 10000 + CAST(l_quantity AS BIGINT))
      |        // (2 * CAST(l_quantity AS BIGINT)), l_suppkey) AS rk
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_type = 'ECONOMY')
      |SELECT p_partkey, p_name, unit_cost AS min_unit_cost, s_name, n_name
      |FROM ranked
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE rk = 1 ORDER BY p_partkey""".stripMargin

  /** §2.176 TPC-H Q15 shape: the top supplier(s) by quarterly revenue —
    * an argmax-of-aggregate. One map-side-combined groupBy builds the
    * per-supplier revenue view; the max is a broadcast 1-row aggregate
    * joined back (no window, no second pass over the fact). */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate").between(lit("1997-01-01"), lit("1997-03-31")))
      .groupBy(col("l_suppkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
        .as("total_revenue"))
    val mx = rev.agg(max("total_revenue").as("max_revenue"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_revenue") === col("max_revenue"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  val q15TopSupplierSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
      |                       AND TIMESTAMP '1997-03-31 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** §2.177 TPC-H Q22 shape: wealthy customers who never ordered, by
    * nation. The global-average scalar broadcasts into the scan filter;
    * the "no recent orders" test (lapsed since 1999) is a left-anti
    * join against the date-filtered orders key projection (shuffle on
    * custkey — the unavoidable co-location — with the acctbal filter
    * already applied map-side, so only the wealthy slice shuffles and
    * the date predicate prunes the anti side at the scan). */
  def q22LostCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val avgBal = cust.filter(col("c_acctbal") > 0.0)
      .agg(avg("c_acctbal").as("avg_bal"))
    val wealthy = cust.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
    wealthy.join(Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= lit("1999-01-01"))
        .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_custs"),
        round(sum("c_acctbal"), 4).as("total_acctbal"))
      .orderBy("nationkey")
  }

  val q22LostCustomersSql: String =
    """SELECT c_nationkey AS nationkey, count(*) AS n_custs,
      |  round(sum(c_acctbal), 4) AS total_acctbal
      |FROM customer
      |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
      |GROUP BY c_nationkey ORDER BY nationkey""".stripMargin
}
