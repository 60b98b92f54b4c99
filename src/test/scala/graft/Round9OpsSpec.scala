package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analytics.Assoc

/** Brute-force replays for the round-9 association/drift family:
  * kendall_tau, cramers_v, runs_test, js_drift, dau_mau_stickiness. */
class Round9OpsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  private def cents(v: Double): Long = math.round(v * 100)

  private def dayOf(t: java.sql.Timestamp): String =
    t.toLocalDateTime.toLocalDate.toString

  private lazy val events = Tables.events(spark, sf)
    .select("event_id", "ts", "user_id", "event_type", "value").collect()
    .map(r => (r.getLong(0), r.getAs[java.sql.Timestamp](1), r.getLong(2),
      r.getString(3), r.getDouble(4)))

  test("kendall_tau = brute pairwise tau-b over the day series") {
    val byDay = events.filter(e => e._4 == "click" || e._4 == "purchase")
      .groupBy(e => dayOf(e._2))
      .map { case (d, es) =>
        (d, es.filter(_._4 == "click").map(e => cents(e._5)).sum,
          es.filter(_._4 == "purchase").map(e => cents(e._5)).sum)
      }.toSeq.sortBy(_._1)
    var c = 0L; var dd = 0L; var tx = 0L; var ty = 0L
    for (i <- byDay.indices; j <- i + 1 until byDay.length) {
      val p = (byDay(i)._2 - byDay(j)._2) * (byDay(i)._3 - byDay(j)._3)
      if (p > 0) c += 1 else if (p < 0) dd += 1
      if (byDay(i)._2 == byDay(j)._2) tx += 1
      if (byDay(i)._3 == byDay(j)._3) ty += 1
    }
    val n = byDay.length.toLong
    val n0 = n * (n - 1) / 2
    val tau = (c - dd).toDouble / math.sqrt((n0 - tx).toDouble * (n0 - ty))
    val r = Assoc.kendallTau(spark, sf).collect().head
    assert(r.getLong(0) == n && r.getLong(1) == c && r.getLong(2) == dd)
    assert(r.getLong(3) == tx && r.getLong(4) == ty)
    assert(math.abs(r.getDouble(5) - tau) < 1e-5)
    assert(math.abs(r.getDouble(5)) <= 1.0 + 1e-9)
  }

  test("cramers_v = brute chi-square over the type x dow contingency") {
    val cal = java.time.ZoneOffset.UTC
    val cells = events.groupBy(e =>
      (e._4, e._2.toLocalDateTime.toLocalDate.getDayOfWeek.getValue % 7 + 1))
      .view.mapValues(_.size.toLong).toMap
    val n = cells.values.sum
    val rowT = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val colT = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val chi2 = cells.toSeq.sortBy(_._1).map { case ((r0, c0), o) =>
      val e = rowT(r0).toDouble * colT(c0) / n
      (o - e) * (o - e) / e
    }.sum
    val v = math.sqrt(chi2 / (n.toDouble *
      math.min(rowT.size - 1, colT.size - 1)))
    val r = Assoc.cramersV(spark, sf).collect().head
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == rowT.size.toLong && r.getLong(2) == colT.size.toLong)
    assert(math.abs(r.getDouble(3) - chi2) < 1e-3, s"${r.getDouble(3)} vs $chi2")
    assert(math.abs(r.getDouble(4) - v) < 1e-6)
    locally { val _ = cal }
  }

  test("runs_test = brute runs count and z over the daily direction") {
    val byDay = events.groupBy(e => dayOf(e._2))
      .view.mapValues(_.map(e => cents(e._5)).sum).toSeq.sortBy(_._1)
    val sorted = byDay.map(_._2).sorted
    // smallest cents with 2*cum >= n (ties on (cents, day) don't move it)
    val n = sorted.length
    val med = sorted((n - 1) / 2)
    val ups = byDay.map(_._2 > med)
    val runs = 1 + ups.sliding(2).count(w => w.length == 2 && w(0) != w(1))
    val n1 = ups.count(identity).toLong
    val n2 = n - n1
    val mu = 2.0 * n1 * n2 / (n1 + n2) + 1.0
    val sig2 = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) /
      ((n1 + n2).toDouble * (n1 + n2) * (n1 + n2 - 1))
    val z = (runs - mu) / math.sqrt(sig2)
    val r = Assoc.runsTest(spark, sf).collect().head
    assert(r.getLong(0) == n.toLong && r.getLong(1) == n1 && r.getLong(2) == n2)
    assert(r.getLong(3) == runs.toLong)
    assert(math.abs(r.getDouble(4) - mu) < 1e-5)
    assert(math.abs(r.getDouble(5) - z) < 1e-5)
  }

  test("js_drift = brute Jensen-Shannon per source; bounded by 1 bit; 0 for a " +
       "source distributed like the corpus") {
    val docs = Tables.documents(spark, sf).select("source", "n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1) / 100))
    val tot = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val tt = docs.length.toLong
    val bySrc = docs.groupBy(_._1)
    val gotMap = graft.dq.Drift.jsDrift(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    for ((src, rows) <- bySrc) {
      val aa = rows.size.toLong
      val aBin = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val jsd = tot.keys.toSeq.sorted.map { b =>
        val a = aBin.getOrElse(b, 0L); val t = tot(b)
        val p = a.toDouble / aa; val q = t.toDouble / tt
        val m = (p + q) / 2
        (if (a > 0) p * math.log(p / m) else 0.0) + q * math.log(q / m)
      }.sum * 0.5 / math.log(2.0)
      val (gn, gj) = gotMap(src)
      assert(gn == aa)
      assert(math.abs(gj - jsd) < 1e-6, s"$src: $gj vs $jsd")
      assert(gj >= -1e-9 && gj <= 1.0 + 1e-9)
    }
  }

  test("mann_kendall = brute pairwise S, tie-corrected variance, z") {
    val byDay = events.groupBy(e => dayOf(e._2))
      .view.mapValues(_.map(e => cents(e._5)).sum).toSeq.sortBy(_._1)
      .map(_._2)
    val n = byDay.length
    var s = 0L
    for (i <- 0 until n; j <- i + 1 until n)
      s += java.lang.Long.signum(byDay(j) - byDay(i))
    val tieTerm = byDay.groupBy(identity).values
      .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }).sum
    val varNum = n.toLong * (n - 1) * (2L * n + 5) - tieTerm
    val z =
      if (varNum <= 0) None
      else Some((if (s > 0) s - 1.0 else if (s < 0) s + 1.0 else 0.0) /
        math.sqrt(varNum / 18.0))
    val r = Assoc.mannKendall(spark, sf).collect().head
    assert(r.getLong(0) == n.toLong && r.getLong(1) == s)
    assert(r.getLong(2) == varNum)
    z match {
      case Some(zz) => assert(math.abs(r.getDouble(3) - zz) < 1e-5)
      case None => assert(r.isNullAt(3))
    }
  }

  test("dau_mau_stickiness = brute user-day ratio, within (0, 1]") {
    val ud = events.map(e => (e._3,
      e._2.toLocalDateTime.toLocalDate)).distinct
    val byMonth = ud.groupBy(x => (x._2.getYear, x._2.getMonthValue))
    val got = graft.analytics.Growth.dauMauStickiness(spark, sf).collect()
    assert(got.length == byMonth.size)
    val gm = got.map(r => (r.getAs[java.sql.Timestamp](0)
      .toLocalDateTime.toLocalDate, (r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4)))).toMap
    for (((y, m), rows) <- byMonth) {
      val nDays = rows.map(_._2).distinct.size.toLong
      val sumDau = rows.groupBy(_._2).values.map(_.map(_._1).distinct.size)
        .sum.toLong
      val mau = rows.map(_._1).distinct.size.toLong
      val key = java.time.LocalDate.of(y, m, 1)
      val (gd, gs, gmau, gst) = gm(key)
      assert(gd == nDays && gs == sumDau && gmau == mau)
      assert(math.abs(gst - sumDau.toDouble / (nDays * mau)) < 1e-6)
      assert(gst > 0 && gst <= 1.0 + 1e-9)
    }
  }
}
