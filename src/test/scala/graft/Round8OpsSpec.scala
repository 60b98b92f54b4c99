package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Regression parity for the round-8 fixes. */
class Round8OpsSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("did_estimate floors the midpoint on an ODD calendar span") {
    // 7-day span (odd): half must floor to 3, so day offsets 0..2 are
    // "pre" and 3..7 are "post". A round-to-nearest midpoint (the old
    // DuckDB-oracle CAST semantics) would put half=4 and flip day 3.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("did_odd").toString
    val rows = (0 to 7).flatMap { d =>
      // one even-user click per day, plus a purchase ONLY on day 3 —
      // the disputed day: under floor it lands post, under round pre
      val ts = java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00")
      val click = (d.toLong, ts, 2L, "click", 1.0, "{}")
      if (d == 3) Seq(click, (100L + d, ts, 2L, "purchase", 1.0, "{}"))
      else Seq(click)
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.analytics.Stats.didEstimate(spark, dir).collect().head
    // arm A (even users), pre = days 0..2 -> 3 clicks 0 purchases;
    // post = days 3..7 -> 5 clicks + 1 purchase -> rate 1/6
    assert(r.getDouble(0) == 0.0, "rate_a_pre: day 3 must NOT be pre")
    assert(math.abs(r.getDouble(1) - 1.0 / 6.0) < 1e-5, "rate_a_post")
  }

  test("ab_test_multi fails loudly when hypothesis count != BhCritZ grid size") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ab_m").toString
    // only 2 event types (< the 5-rung grid) across both arms
    val rows = for {
      u <- 0L until 40L; t <- Seq("click", "view")
    } yield (u * 2 + (if (t == "click") 0 else 1),
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), u, t,
      (u % 7).toDouble, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ex = intercept[Exception] {
      graft.analytics.Stats.abTestMulti(spark, dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("hypothesis count")),
      s"expected the BhCritZ-grid assert, got: $ex")
  }

  test("trailing_30d_revenue = brute per-order 30-day window replay") {
    val sf = SparkTestSession.sf
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).toLocalDateTime.toLocalDate.toEpochDay,
        math.round(r.getDouble(3) * 100)))
    val byCust = orders.groupBy(_._2)
    val got = graft.analytics.Frames.trailing30dRevenue(spark, sf).collect()
    assert(got.length == orders.length)
    got.take(2000).foreach { r =>
      val (ok, ck, day) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val win = byCust(ck).filter(o => o._3 >= day - 29 && o._3 <= day)
      assert(r.getLong(3) == win.map(_._4).sum, s"order $ok cents")
      assert(r.getLong(4) == win.length.toLong, s"order $ok count")
    }
  }

  test("value_ranks = brute ECDF replay; cume_dist ends at 1") {
    val sf = SparkTestSession.sf
    val vals = Tables.events(spark, sf).select("event_type", "value")
      .collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
    val byType = vals.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = graft.analytics.Frames.valueRanks(spark, sf).collect()
    got.take(3000).foreach { r =>
      val (t, c) = (r.getString(0), r.getLong(1))
      val all = byType(t); val n = all.length.toDouble
      assert(r.getLong(2) == all.count(_ == c).toLong)
      val below = all.count(_ < c)
      assert(math.abs(r.getDouble(3) - below / (n - 1)) < 1e-5, s"$t/$c pr")
      assert(math.abs(r.getDouble(4) - all.count(_ <= c) / n) < 1e-5)
    }
    // per type, the last value's cume_dist is exactly 1
    got.groupBy(_.getString(0)).foreach { case (t, rs) =>
      assert(rs.maxBy(_.getLong(1)).getDouble(4) == 1.0, t)
    }
  }

  test("weighted_median = brute lower-weighted-median replay") {
    val sf = SparkTestSession.sf
    val li = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100),
        r.getDouble(2).toLong))
    val got = graft.analytics.Frames.weightedMedian(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    li.groupBy(_._1).foreach { case (flag, rs) =>
      val cells = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      val tot = cells.map(_._2).sum
      var cum = 0L
      val wm = cells.find { case (_, w) => cum += w; cum * 2 >= tot }.get._1
      val (gWm, gNv, gTot) = got(flag)
      assert(gWm == wm && gNv == cells.length.toLong && gTot == tot, flag)
    }
  }

  test("abc_analysis = brute Pareto-class replay; classes partition each segment") {
    val sf = SparkTestSession.sf
    val perCust = Tables.orders(spark, sf)
      .select("o_custkey", "o_totalprice").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => math.round(r.getDouble(1) * 100)).sum).toMap
    val seg = Tables.customer(spark, sf)
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = perCust.toSeq
      .flatMap { case (ck, c) => seg.get(ck).map(s => (s, ck, c)) }
      .groupBy(_._1).flatMap { case (s, custs) =>
        val ranked = custs.sortBy { case (_, ck, c) => (-c, ck) }
        val tot = ranked.map(_._3).sum
        var cum = 0L
        ranked.map { case (_, ck, c) =>
          cum += c
          val cls = if (cum * 10 <= tot * 8) "A"
            else if (cum * 20 <= tot * 19) "B" else "C"
          ((s, cls), c)
        }.groupBy(_._1).map { case (k, xs) =>
          k -> (xs.length.toLong, xs.map(_._2).sum)
        }
      }
    val got = graft.analytics.Frames.abcAnalysis(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
  }

  test("unpivot_metrics = brute melt of the wide per-type aggregate") {
    val sf = SparkTestSession.sf
    val ev = Tables.events(spark, sf).select("event_type", "value").collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
    val expected = ev.groupBy(_._1).flatMap { case (t, rs) =>
      val cs = rs.map(_._2)
      Seq((t, "n_events", cs.length.toLong), (t, "sum_cents", cs.sum),
        (t, "min_cents", cs.min), (t, "max_cents", cs.max))
    }.toSet
    val got = graft.analytics.Frames.unpivotMetrics(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("attribution_markov channel-set guard matches the oracle's chain list") {
    // the oracle SQL unrolls a removal chain per MarkovChannels entry;
    // the Spark side must keep asserting the observed set equals it
    assert(graft.analytics.Mining.MarkovChannels ==
      Seq("click", "error", "signup", "view"))
    // and the real corpus still satisfies the guard (no throw)
    val out = graft.analytics.Mining
      .attributionMarkov(spark, SparkTestSession.sf).collect()
    assert(out.map(_.getString(0)).toSeq ==
      graft.analytics.Mining.MarkovChannels)
  }
}
