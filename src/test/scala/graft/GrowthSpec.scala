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
