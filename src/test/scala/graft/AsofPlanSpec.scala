package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.AsofJoinOp

class AsofPlanSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("native as-of join: inclusive ties, no-match nulls, key isolation") {
    val trades = Seq(
      (1L, "a", ts("2024-01-01 10:00:00")), // before any quote → null
      (2L, "a", ts("2024-01-01 10:05:00")), // exact tie → inclusive
      (3L, "a", ts("2024-01-01 10:30:00")), // latest prior = 10:10
      (4L, "b", ts("2024-01-01 10:30:00"))  // key b has no quotes
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("a", ts("2024-01-01 10:05:00"), 101.0),
      ("a", ts("2024-01-01 10:10:00"), 102.0),
      ("c", ts("2024-01-01 09:00:00"), 999.0)
    ).toDF("q_sym", "q_t", "px")
    val out = AsofJoinOp.asofJoin(trades, quotes,
        Seq("sym"), Seq("q_sym"), "t", "q_t")
      .select("trade_id", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out(1L).isEmpty)
    assert(out(2L).contains(101.0))
    assert(out(3L).contains(102.0))
    assert(out(4L).isEmpty)
  }

  test("native as-of join matches the composed window formulation on events") {
    val composed = graft.analytics.Queries.asofJoin(spark, sf).collect().toSeq
    val native = graft.analytics.Queries.asofJoinNative(spark, sf).collect().toSeq
    assert(native.length == composed.length)
    assert(native == composed)
  }

  test("randomized differential: native as-of equals naive reference, 2-col keys") {
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 3) {
      val nL = 200 + round * 50
      val nR = 150 + round * 30
      // two-column key (k1, k2) with deliberate collisions; times in a
      // small range so ties and before-first-right cases all occur
      val lhs = (1 to nL).map { i =>
        (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(3).toLong, rnd.nextInt(100).toLong)
      }
      val rhs = (1 to nR).map { i =>
        (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(3).toLong, rnd.nextInt(100).toLong,
          rnd.nextDouble())
      }
      val lDf = lhs.toDF("lid", "k1", "k2", "lt")
      val rDf = rhs.toDF("rid", "rk1", "rk2", "rt", "payload")
      val got = AsofJoinOp.asofJoin(lDf, rDf,
          Seq("k1", "k2"), Seq("rk1", "rk2"), "lt", "rt")
        .select("lid", "rt", "payload").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2))))).toMap
      // naive reference: latest right (max rt, then arbitrary among
      // exact-duplicate (key, rt) rows) with rt <= lt
      lhs.foreach { case (lid, k1, k2, lt) =>
        val cand = rhs.filter(r => r._2 == k1 && r._3 == k2 && r._4 <= lt)
        if (cand.isEmpty) assert(got(lid).isEmpty, s"lid=$lid expected no match")
        else {
          val bestT = cand.map(_._4).max
          val payloads = cand.filter(_._4 == bestT).map(_._5).toSet
          val g = got(lid)
          assert(g.isDefined && g.get._1 == bestT && payloads.contains(g.get._2),
            s"lid=$lid got $g want t=$bestT payload in $payloads")
        }
      }
    }
  }

  test("optimizer rule pushes a limit into the as-of join's left side") {
    import org.apache.spark.sql.catalyst.plans.logical.LocalLimit
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"))
    val limited = AsofJoinOp.asofJoin(purchases, clicks,
      Seq("user_id"), Seq("c_user_id"), "ts", "click_ts").limit(7)
    val limits = limited.queryExecution.optimizedPlan.collect {
      case l: LocalLimit => l
    }
    // one limit above the join (from .limit) and one pushed into the
    // left child by AsofLimitPushdown
    assert(limits.size >= 2, limited.queryExecution.optimizedPlan.toString)
    val pushed = limited.queryExecution.optimizedPlan.collect {
      case aj: graft.plans.AsofJoinPlan if aj.left.isInstanceOf[LocalLimit] => aj
    }
    assert(pushed.nonEmpty, "limit must sit below the join on the left side")
    assert(limited.count() == 7)
  }

  test("plan: AsofJoinExec with one hash exchange per side, no window") {
    val df = graft.analytics.Queries.asofJoinNative(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan.take(2000))
    assert(!plan.contains("Window"), "native path must not fall back to a window")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 hash exchanges, got $exchanges:\n${plan.take(3000)}")
  }
}
