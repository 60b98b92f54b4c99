package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analytics.Growth
import graft.dq.Freshness

/** §2.249–251: growth_accounting, streak_lengths, dq_freshness —
  * brute replays over the collected sf0.001 tables. */
class GrowthSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  private def userWeeks: Map[Long, Seq[java.time.LocalDate]] =
    Tables.events(spark, sf)
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("week"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted.toSeq).toMap

  test("growth_accounting = brute user-week classification; identities hold") {
    val uw = userWeeks
    val maxWeek = uw.values.flatten.max
    val statuses = uw.values.flatMap { weeks =>
      weeks.zipWithIndex.map { case (w, i) =>
        val st =
          if (i == 0) "new"
          else if (weeks(i - 1) == w.minusDays(7)) "retained"
          else "resurrected"
        (w, st)
      } ++ weeks.zipWithIndex.collect {
        case (w, i) if !w.plusDays(7).isAfter(maxWeek) &&
          (i == weeks.length - 1 || weeks(i + 1) != w.plusDays(7)) =>
          (w.plusDays(7), "churned")
      }
    }.toSeq
    val expected = statuses.groupBy(_._1).view.mapValues { rs =>
      val c = rs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      (c.getOrElse("new", 0L), c.getOrElse("retained", 0L),
        c.getOrElse("resurrected", 0L), c.getOrElse("churned", 0L))
    }.toMap
    val got = Growth.growthAccounting(spark, sf).collect()
    assert(got.length == expected.size)
    val activeByWeek = got.map(r =>
      r.getTimestamp(0).toLocalDateTime.toLocalDate -> r.getLong(5)).toMap
    got.foreach { r =>
      val w = r.getTimestamp(0).toLocalDateTime.toLocalDate
      val (nn, nr, ns, nc) = expected(w)
      assert(r.getLong(1) == nn && r.getLong(2) == nr &&
        r.getLong(3) == ns && r.getLong(4) == nc, s"week $w")
      // identity: active = new + retained + resurrected
      assert(r.getLong(5) == nn + nr + ns)
      // identity: churned(w) = active(w-1) - retained(w)
      activeByWeek.get(w.minusDays(7)).foreach { prevActive =>
        assert(nc == prevActive - nr, s"churn identity at $w")
      }
    }
  }

  test("streak_lengths = brute longest-run histogram; sums to user count") {
    val ud = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted.toSeq).toMap
    val maxStreak = ud.view.mapValues { days =>
      var best = 1L; var cur = 1L
      days.sliding(2).foreach {
        case Seq(a, b) =>
          cur = if (b == a.plusDays(1)) cur + 1 else 1
          best = math.max(best, cur)
        case _ => ()
      }
      best
    }.toMap
    val expected = maxStreak.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val got = graft.analytics.Growth.streakLengths(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      assert(r.getLong(1) == expected(r.getLong(0)), s"streak ${r.getLong(0)}")
    }
    assert(got.map(_.getLong(1)).sum == ud.size.toLong)
  }

  test("hhi_report = brute share-squared sums; bounds 1/n <= HHI <= 1") {
    import graft.dq.Concentration
    val got = Concentration.hhiReport(spark, sf).collect()
    assert(got.length == 3)
    def hhi(ws: Seq[Long]): Double = {
      val t = ws.sum.toDouble
      ws.map(w => (w / t) * (w / t)).sum
    }
    val bySrc = Tables.documents(spark, sf).groupBy("source").count()
      .collect().map(_.getLong(1)).toSeq
    val byCust = Tables.orders(spark, sf).groupBy("o_custkey").count()
      .collect().map(_.getLong(1)).toSeq
    val byBrand = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("w"))
      .collect().map(_.getLong(1)).toSeq
    val expect = Map("documents_by_source" -> bySrc,
      "orders_by_customer" -> byCust, "revenue_by_brand" -> byBrand)
    got.foreach { r =>
      val ws = expect(r.getString(0))
      assert(r.getLong(1) == ws.length.toLong)
      assert(r.getLong(2) == ws.sum)
      val h = hhi(ws)
      assert(math.abs(r.getDouble(3) - h) < 1e-5, r.getString(0))
      assert(h >= 1.0 / ws.length - 1e-9 && h <= 1.0 + 1e-9)
      assert(math.abs(r.getDouble(4) -
        (h - 1.0 / ws.length) / (1.0 - 1.0 / ws.length)) < 1e-4)
    }
  }

  test("srm_check = brute per-day arm counts; z from binomial moments") {
    import graft.dq.Concentration
    val ud = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val perDay = ud.groupBy(_._1).view.mapValues { rs =>
      (rs.count(_._2 % 2 == 0).toLong, rs.count(_._2 % 2 != 0).toLong)
    }.toMap
    val got = Concentration.srmCheck(spark, sf).collect()
    assert(got.length == perDay.size)
    got.foreach { r =>
      val d = r.getTimestamp(0).toLocalDateTime.toLocalDate
      val (na, nb) = perDay(d)
      assert(r.getLong(1) == na && r.getLong(2) == nb, s"$d")
      val n = (na + nb).toDouble
      val z = (na - n * 0.5) / math.sqrt(n * 0.25)
      assert(math.abs(r.getDouble(3) - z) < 1e-3)
      assert(r.getBoolean(4) == (math.abs(z) > 3.0))
    }
  }

  test("page_hinkley = brute PH fold; PH >= 0 and >= final-cum deviation") {
    import graft.analytics.Series
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => ((r.getString(0), r.getDate(1).toLocalDate), r.getLong(2)))
      .toMap
    val got = Series.pageHinkley(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val et = r.getString(0)
      val days = daily.keys.collect { case (e, d) if e == et => d }
      val (d0, d1) = (days.min, days.max)
      val xs = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
        .map(d => daily.getOrElse((et, d), 0L).toDouble).toIndexedSeq
      val n = xs.length
      val mu = xs.sum / n
      val sd = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / (n - 1))
      var cum = 0.0; var mn = 0.0; var ph = 0.0
      xs.foreach { x =>
        cum += x - mu
        mn = math.min(mn, cum)
        ph = math.max(ph, cum - mn)
      }
      assert(r.getLong(1) == n.toLong)
      assert(math.abs(r.getDouble(2) - mu) < 1e-3)
      assert(math.abs(r.getDouble(3) - ph) < 1e-2, s"$et PH")
      assert(r.getDouble(3) >= -1e-9)
      assert(math.abs(r.getDouble(4) - 3.0 * sd * math.sqrt(n)) < 2e-2)
      val thr = 3.0 * sd * math.sqrt(n)
      if (math.abs(ph - thr) > 1e-3) // away from the boundary, flag is exact
        assert(r.getBoolean(5) == (ph > thr), s"$et flag")
    }
  }

  test("item_novelty = brute first-seen weekly shares; week 1 is 100% new") {
    val iv = Tables.events(spark, sf)
      .selectExpr("get_json_object(props, '$.k')", "ts").collect()
      .filter(!_.isNullAt(0))
      .map { r =>
        val d = r.getTimestamp(1).toLocalDateTime.toLocalDate
        (r.getString(0).toInt,
          d.minusDays((d.getDayOfWeek.getValue - 1).toLong))
      }
    val firstSeen = iv.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val byWeek = iv.groupBy(_._2)
    val got = graft.analytics.Growth.itemNovelty(spark, sf).collect()
    assert(got.length == byWeek.size)
    got.foreach { r =>
      val w = r.getTimestamp(0).toLocalDateTime.toLocalDate
      val evs = byWeek(w)
      val items = evs.map(_._1).distinct
      val newItems = items.filter(firstSeen(_) == w)
      val newEvents = evs.count(e => firstSeen(e._1) == w)
      assert(r.getLong(1) == evs.length.toLong, s"$w events")
      assert(r.getLong(2) == items.length.toLong)
      assert(r.getLong(3) == newItems.length.toLong)
      assert(math.abs(r.getDouble(4) -
        newEvents.toDouble / evs.length) < 1e-5)
    }
    // the corpus's first week is definitionally all-new
    assert(math.abs(got.head.getDouble(4) - 1.0) < 1e-9)
  }

  test("interevent_stats = brute per-user gap CVs; quartiles ordered") {
    val byUser = Tables.events(spark, sf)
      .select("user_id", "event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
      .groupBy(_._1)
    def micros(t: java.sql.Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000L
    val cvs = byUser.values.flatMap { evs =>
      val sorted = evs.sortBy(e => (micros(e._3), e._2))
      val gaps = sorted.sliding(2).collect { case Array(a, b) =>
        micros(b._3) - micros(a._3)
      }.toSeq
      if (gaps.length < 2) None
      else {
        val n = gaps.length
        val mu = gaps.sum.toDouble / n
        val s2 = gaps.map(g => BigInt(g) * BigInt(g)).sum
        val v = (s2.toDouble - n * mu * mu) / (n - 1)
        val sd = math.sqrt(math.max(v, 0.0))
        if (mu > 0) Some(sd / mu) else None
      }
    }.toSeq
    def q(p: Double): Double = {
      val s = cvs.sorted; val h = (s.length - 1) * p
      val lo = s(h.toInt)
      if (h.toInt + 1 < s.length) lo + (h - h.toInt) * (s(h.toInt + 1) - lo)
      else lo
    }
    val r = graft.analytics.Growth.intereventStats(spark, sf).collect().head
    assert(r.getLong(0) == cvs.size.toLong)
    assert(math.abs(r.getDouble(1) - q(0.25)) < 1e-3)
    assert(math.abs(r.getDouble(2) - q(0.5)) < 1e-3)
    assert(math.abs(r.getDouble(3) - q(0.75)) < 1e-3)
    assert(r.getDouble(1) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(3))
    assert(r.getLong(4) == cvs.count(_ > 1.5).toLong)
  }

  test("session_gap_sweep = brute sessionization at 3 gaps; monotone in gap") {
    import graft.analytics.Sweeps
    def micros(t: java.sql.Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000L
    val byUser = Tables.events(spark, sf)
      .select("user_id", "event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), micros(r.getTimestamp(2))))
      .groupBy(_._1).view.mapValues(_.sortBy(e => (e._3, e._2))).toMap
    val got = Sweeps.sessionGapSweep(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSeq == Sweeps.SweepGapsMin.map(_.toLong))
    got.foreach { r =>
      val gapUs = r.getLong(0) * 60L * 1000000L
      val sessions = byUser.values.flatMap { evs =>
        val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]() // (n, dur)
        var n = 0L; var first = 0L; var last = 0L
        evs.foreach { case (_, _, us) =>
          if (n == 0 || us - last > gapUs) {
            if (n > 0) out += ((n, last - first))
            n = 1; first = us; last = us
          } else { n += 1; last = us }
        }
        if (n > 0) out += ((n, last - first))
        out
      }.toSeq
      assert(r.getLong(1) == sessions.size.toLong, s"gap ${r.getLong(0)}")
      assert(math.abs(r.getDouble(2) -
        sessions.map(_._1).sum.toDouble / sessions.size) < 1e-3)
      assert(math.abs(r.getDouble(3) -
        sessions.count(_._1 == 1).toDouble / sessions.size) < 1e-5)
      assert(math.abs(r.getDouble(4) -
        sessions.map(_._2).sum.toDouble / sessions.size / 1e6) < 1e-2)
    }
    // wider gap => fewer (or equal) sessions, each at least as long
    got.map(_.getLong(1)).sliding(2).foreach {
      case Array(a, b) => assert(b <= a); case _ => ()
    }
  }

  test("source_lang_mix = brute per-source language entropy; evenness <= 1") {
    import graft.analytics.Sweeps
    val cells = Tables.documents(spark, sf)
      .groupBy("source", "lang").count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .groupBy(_._1._1).view.mapValues(_.map(_._2)).toMap
    val got = Sweeps.sourceLangMix(spark, sf).collect()
    assert(got.length == cells.count(_._2.size > 1))
    got.foreach { r =>
      val cs = cells(r.getString(0))
      val n = cs.sum.toDouble
      val h = math.log(n) - cs.map(c => c * math.log(c.toDouble)).sum / n
      assert(r.getLong(1) == cs.sum && r.getLong(2) == cs.size.toLong)
      assert(math.abs(r.getDouble(3) - h) < 1e-3, r.getString(0))
      assert(math.abs(r.getDouble(4) - h / math.log(cs.size.toDouble)) < 1e-3)
      assert(r.getDouble(4) <= 1.0 + 1e-9 && r.getDouble(4) >= -1e-9)
      assert(math.abs(r.getDouble(5) - cs.max / n) < 1e-5)
    }
  }

  test("dq_freshness = brute min/max day; freshest table has zero staleness") {
    val got = Freshness.dqFreshness(spark, sf).collect()
    assert(got.length == 3)
    assert(got.exists(_.getLong(5) == 0L), "some table is the watermark")
    got.foreach { r =>
      assert(r.getLong(5) >= 0L)
      assert(r.getLong(4) >= 0L)
      assert(r.getLong(1) > 0L)
    }
    val ev = got.find(_.getString(0) == "events").get
    val (mn, mx) = Tables.events(spark, sf)
      .agg(min(to_date(col("ts"))), max(to_date(col("ts"))))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getDate(1).toLocalDate))
      .head
    assert(ev.getTimestamp(2).toLocalDateTime.toLocalDate == mn)
    assert(ev.getTimestamp(3).toLocalDateTime.toLocalDate == mx)
    assert(ev.getLong(4) == java.time.temporal.ChronoUnit.DAYS.between(mn, mx))
  }
}
