package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Plan + brute-force checks for the TPC-H family (§2.163–167). */
class TpchSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  test("q7/q10/q2 broadcast every dimension; no SMJ in the star joins") {
    for (df <- Seq(analytics.Tpch.q7Volume(spark, sf),
                   analytics.Tpch.q10Returned(spark, sf),
                   analytics.Tpch.q2MinCost(spark, sf))) {
      val plan = df.queryExecution.sparkPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
      assert(!plan.contains("SortMergeJoin"),
        "dimension joins must broadcast at test SF:\n" +
          plan.linesIterator.filter(_.contains("Join")).mkString("\n"))
    }
  }

  test("q10 pushes returnflag + date filters into the parquet scans") {
    val plan = analytics.Tpch.q10Returned(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("l_returnflag"), plan.take(3000))
  }

  test("q17 revenue loss = brute-force per-part threshold") {
    val li = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_brand") === "Brand#1"),
        col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val avgQ = li.groupBy(_._1).map { case (k, rs) =>
      k -> rs.map(_._2).sum / rs.size
    }
    val small = li.filter { case (k, q, _) => q < 0.5 * avgQ(k) }
    val expLoss = math.rint(small.map(_._3).sum / 7.0 * 1e4) / 1e4
    val row = analytics.Tpch.q17SmallQty(spark, sf).collect().head
    assert(row.getLong(1) === small.length.toLong)
    assert(math.abs(row.getDouble(0) - expLoss) < 1e-6)
  }

  test("q2 min_by struct picks the min-cost, min-suppkey supplier per part") {
    val rows = analytics.Tpch.q2MinCost(spark, sf).collect()
    val brute = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_type") === "ECONOMY"),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"),
        round(col("l_extendedprice") / col("l_quantity"), 6).as("uc"),
        col("l_suppkey"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .groupBy(_._1).map { case (k, rs) => k -> rs.map(t => (t._2, t._3)).min }
    assert(rows.length === brute.size)
    rows.foreach { r =>
      val (uc, sk) = brute(r.getLong(0))
      assert(r.getDouble(2) === uc)
      assert(r.getString(3) === f"Supplier#$sk%09d",
        s"supplier name ${r.getString(3)} != suppkey $sk")
    }
  }

  test("q15 returns exactly the argmax supplier(s) of the quarter") {
    val rows = analytics.Tpch.q15TopSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    val rev = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate").between(lit("1997-01-01"), lit("1997-03-31")))
      .groupBy("l_suppkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
        .as("r")).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val mx = rev.map(_._2).max
    assert(rows.map(_.getLong(0)).toSet === rev.filter(_._2 == mx).map(_._1).toSet)
    rows.foreach(r => assert(r.getDouble(2) === mx))
  }

  test("q22 = wealthy-lapsed brute force; anti side is date-pruned at the scan") {
    val custs = Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val pos = custs.map(_._3).filter(_ > 0.0)
    val avgBal = pos.sum / pos.length
    val recent = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1999-01-01"))
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val exp = custs.filter(c => c._3 > avgBal && !recent.contains(c._1))
      .groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val got = analytics.Tpch.q22LostCustomers(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got === exp)
    val plan = analytics.Tpch.q22LostCustomers(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"), plan.take(3000))
  }
}
