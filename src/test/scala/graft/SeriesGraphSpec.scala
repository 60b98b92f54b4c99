package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analytics.Mining
import graft.graph.Graph

/** §2.211–213: graph_modularity, forecast_backtest, changepoint_cusum
  * — brute-force replays over the collected sf0.001 tables. */
class SeriesGraphSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  private def dailyCounts: Map[(String, java.time.LocalDate), Long] =
    Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => ((r.getString(0), r.getDate(1).toLocalDate), r.getLong(2)))
      .toMap

  test("forecast_backtest = walk-forward MA7/persistence replay") {
    val daily = dailyCounts
    val got = Mining.forecastBacktest(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val et = r.getString(0)
      val series = daily.collect { case ((e, d), n) if e == et => (d, n) }
        .toSeq.sortBy(_._1)
      val ns = series.map(_._2)
      val scored = (7 until ns.length).map { i =>
        val ma7 = ns.slice(i - 7, i).sum.toDouble / 7.0
        val naive = ns(i - 1).toDouble
        (math.abs(ns(i) - ma7) / ns(i), math.abs(ns(i) - naive) / ns(i))
      }
      assert(r.getLong(1) === scored.size.toLong, s"$et n_days")
      def r4(x: Double) = BigDecimal(x)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(2) - r4(scored.map(_._1).sum / scored.size)) < 1e-9)
      assert(math.abs(r.getDouble(3) - r4(scored.map(_._2).sum / scored.size)) < 1e-9)
      assert(math.abs(r.getDouble(4) - r4(r.getDouble(3) - r.getDouble(2))) < 1e-9)
    }
  }

  test("changepoint_cusum = brute argmax |cusum|; sides partition the series") {
    val daily = dailyCounts
    val got = Mining.changepointCusum(spark, sf).collect()
    got.foreach { r =>
      val et = r.getString(0)
      val series = daily.collect { case ((e, d), n) if e == et => (d, n) }
        .toSeq.sortBy(_._1)
      val mean = series.map(_._2).sum.toDouble / series.size
      var acc = 0.0
      val cusums = series.map { case (d, n) => acc += n - mean; (d, acc) }
      val (bd, bc) = cusums.maxBy { case (d, c) =>
        (math.abs(c), -d.toEpochDay) } // ties -> earliest day
      assert(r.getTimestamp(1).toLocalDateTime.toLocalDate === bd, s"$et day")
      assert(math.abs(r.getDouble(2) - bc) < 1e-3, s"$et peak")
      val before = series.filter(!_._1.isAfter(bd)).map(_._2)
      val after = series.filter(_._1.isAfter(bd)).map(_._2)
      assert(math.abs(r.getDouble(3) - before.sum.toDouble / before.size) < 1e-3)
      if (after.nonEmpty)
        assert(math.abs(r.getDouble(4) - after.sum.toDouble / after.size) < 1e-3)
      // final cusum returns to ~0 by construction
      assert(math.abs(cusums.last._2) < 1e-6)
    }
  }

  test("graph_modularity = brute Q over the LP communities") {
    val labels = Graph.lpLabels(spark, sf).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val uv = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select(concat(lit("u"), col("user_id")).as("u"),
        concat(lit("i"), get_json_object(col("props"), "$.k")).as("v"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    val m = uv.length.toDouble // undirected edges
    val deg = (uv.map(_._1) ++ uv.map(_._2)).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val byComm = deg.groupBy { case (n, _) => labels(n) }.view
      .mapValues(_.values.sum).toMap
    val q = byComm.map { case (c, dc) =>
      uv.count { case (a, b) =>
        labels(a) == c && labels(b) == c }.toDouble / m -
        math.pow(dc / (2.0 * m), 2)
    }.sum

    val r = Graph.graphModularity(spark, sf).collect().head
    assert(r.getLong(0) === uv.length.toLong, "n_edges")
    assert(r.getLong(1) === byComm.size.toLong, "n_communities")
    assert(math.abs(r.getDouble(2) - q) < 1e-4, s"Q got ${r.getDouble(2)} want $q")
  }

  test("survival_km = brute product-limit; risk sets telescope; S monotone") {
    import graft.analytics.Survival
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("value"),
        to_date(col("ts")).as("day")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDate(3).toLocalDate))
    val horizon = ev.map(_._4).max
    val perUser = ev.groupBy(_._1).toSeq.map { case (_, es) =>
      val first = es.map(_._4).min
      val conv = es.filter(e =>
        e._2 == "purchase" && e._3 > Survival.ConvValueMin).map(_._4)
      if (conv.nonEmpty)
        (java.time.temporal.ChronoUnit.DAYS.between(first, conv.min), 1L)
      else (java.time.temporal.ChronoUnit.DAYS.between(first, horizon), 0L)
    }.toSeq
    val byDur = perUser.groupBy(_._1).view.mapValues { xs =>
      (xs.count(_._2 == 1L).toLong, xs.count(_._2 == 0L).toLong)
    }.toMap
    val durs = byDur.keys.toSeq.sorted
    var atRisk = perUser.size.toLong
    var s = 1.0
    val expected = durs.map { t =>
      val (d, c) = byDur(t)
      s *= 1.0 - d.toDouble / atRisk
      val row = (t, atRisk, d, c, s)
      atRisk -= d + c
      row
    }
    val got = Survival.survivalKm(spark, sf).collect()
    assert(got.length == expected.length)
    got.sortBy(_.getLong(0)).zip(expected).foreach { case (r, (t, n, d, c, sv)) =>
      assert(r.getLong(0) == t && r.getLong(1) == n &&
        r.getLong(2) == d && r.getLong(3) == c, s"counts at t=$t")
      assert(math.abs(r.getDouble(4) - sv) < 1e-4, s"S(t=$t)")
    }
    // survival is non-increasing and starts ≤ 1
    val ss = got.sortBy(_.getLong(0)).map(_.getDouble(4))
    assert(ss.head <= 1.0 + 1e-9)
    ss.sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-9) }
    // the risk sets telescope back to the full population
    assert(got.map(r => r.getLong(2) + r.getLong(3)).sum == perUser.size)
  }

  test("stl_decompose: components rebuild x; seasonal = dow mean of detrended") {
    import graft.analytics.Series
    val daily = dailyCounts
    val got = Series.stlDecompose(spark, sf).collect()
    assert(got.nonEmpty)
    val byType = got.groupBy(_.getString(0))
    byType.foreach { case (et, rs) =>
      val days = daily.keys.collect { case (e, d) if e == et => d }
      val (d0, d1) = (days.min, days.max)
      val series = Iterator.iterate(d0)(_.plusDays(1))
        .takeWhile(!_.isAfter(d1))
        .map(d => d -> daily.getOrElse((et, d), 0L)).toIndexedSeq
      // trend = centered MA7 on full windows only
      val trend = (3 until series.length - 3).map { i =>
        series(i)._1 -> series.slice(i - 3, i + 4).map(_._2).sum / 7.0
      }.toMap
      assert(rs.length == trend.size, s"$et scored-day count")
      val det = trend.map { case (d, tr) =>
        d -> (daily.getOrElse((et, d), 0L) - tr) }
      val seas = det.groupBy(_._1.getDayOfWeek).view
        .mapValues(v => v.values.sum / v.size).toMap
      rs.foreach { r =>
        val d = r.getTimestamp(1).toLocalDateTime.toLocalDate
        assert(math.abs(r.getDouble(3) - trend(d)) < 1e-4, s"trend $et $d")
        assert(math.abs(r.getDouble(4) - seas(d.getDayOfWeek)) < 1e-4)
        // decomposition identity: n = trend + seasonal + resid
        assert(math.abs(r.getLong(2) -
          (r.getDouble(3) + r.getDouble(4) + r.getDouble(5))) < 2e-4)
      }
      // seasonal components of the scored days sum to ~0 when every dow
      // appears equally often; weaker invariant: mean of residuals ≈ 0
      val meanResid = rs.map(_.getDouble(5)).sum / rs.length
      assert(math.abs(meanResid) < 1.0)
    }
  }

  test("anomaly_stl = robust-z > 2 days of the brute STL residual") {
    import graft.analytics.Series
    val daily = dailyCounts
    val got = Series.anomalyStl(spark, sf).collect()
    // brute replay: residual per scored day, then median/MAD flagging
    val expected = daily.keys.map(_._1).toSeq.distinct.sorted.flatMap { et =>
      val days = daily.keys.collect { case (e, d) if e == et => d }
      val (d0, d1) = (days.min, days.max)
      val series = Iterator.iterate(d0)(_.plusDays(1))
        .takeWhile(!_.isAfter(d1))
        .map(d => d -> daily.getOrElse((et, d), 0L)).toIndexedSeq
      val trend = (3 until series.length - 3).map { i =>
        series(i)._1 -> series.slice(i - 3, i + 4).map(_._2).sum / 7.0
      }
      val det = trend.map { case (d, tr) =>
        d -> (daily.getOrElse((et, d), 0L) - tr) }
      val seas = det.groupBy(_._1.getDayOfWeek).view
        .mapValues(v => v.map(_._2).sum / v.size).toMap
      val resid = trend.map { case (d, tr) =>
        d -> (daily.getOrElse((et, d), 0L) - tr - seas(d.getDayOfWeek)) }
      def median(xs: Seq[Double]): Double = {
        val s = xs.sorted; val n = s.length
        if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
      }
      val med = median(resid.map(_._2))
      val mad = median(resid.map(r => math.abs(r._2 - med)))
      resid.collect {
        case (d, r) if math.abs(r - med) > 2.0 * 1.4826 * mad =>
          (et, d, math.abs(r - med) / (1.4826 * mad))
      }
    }
    assert(got.length == expected.length, "flagged-day count")
    got.sortBy(r => (r.getString(0), r.getTimestamp(1).getTime))
      .zip(expected.sortBy(e => (e._1, e._2.toEpochDay))).foreach {
        case (r, (et, d, z)) =>
          assert(r.getString(0) == et)
          assert(r.getTimestamp(1).toLocalDateTime.toLocalDate == d)
          assert(math.abs(r.getDouble(4) - z) < 1e-3, s"robust_z $et $d")
      }
  }

  test("ljung_box = brute portmanteau Q over lags 1..7") {
    import graft.analytics.Series
    val daily = dailyCounts
    val got = Series.ljungBox(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val et = r.getString(0)
      val days = daily.keys.collect { case (e, d) if e == et => d }
      val (d0, d1) = (days.min, days.max)
      val xs = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
        .map(d => daily.getOrElse((et, d), 0L).toDouble).toIndexedSeq
      val n = xs.length
      val mu = xs.sum / n
      val denom = xs.map(x => (x - mu) * (x - mu)).sum
      val rl = (1 to Series.AcfMaxLag).map { l =>
        (0 until n - l).map(i => (xs(i) - mu) * (xs(i + l) - mu)).sum / denom
      }
      val q = n * (n + 2.0) *
        rl.zipWithIndex.map { case (r2, i) => r2 * r2 / (n - i - 1) }.sum
      assert(r.getLong(1) == n.toLong)
      assert(r.getLong(2) == Series.AcfMaxLag.toLong)
      assert(math.abs(r.getDouble(3) - q) < 1e-2, s"$et Q")
      assert(r.getBoolean(4) == (r.getDouble(3) > Series.LjungBoxCrit))
    }
  }

  test("ewma_smooth = brute day-ordered fold at alpha 0.3") {
    import graft.analytics.Series
    val daily = dailyCounts
    val got = Series.ewmaSmooth(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val et = r.getString(0)
      val days = daily.keys.collect { case (e, d) if e == et => d }
      val (d0, d1) = (days.min, days.max)
      val xs = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
        .map(d => daily.getOrElse((et, d), 0L).toDouble).toIndexedSeq
      val a = Series.EwmaAlpha
      val ewma = xs.tail.foldLeft(xs.head)((acc, x) => acc * (1 - a) + x * a)
      assert(r.getInt(1) == xs.length)
      assert(r.getTimestamp(2).toLocalDateTime.toLocalDate == d1)
      assert(r.getLong(3) == xs.last.toLong)
      assert(math.abs(r.getDouble(4) - ewma) < 1e-3, s"$et ewma")
      assert(math.abs(r.getDouble(5) - (xs.last - ewma)) < 1e-3, s"$et gap")
    }
  }

  private def xySeries: IndexedSeq[(Long, Long)] = {
    val daily = dailyCounts
    val days = daily.keys.collect {
      case (e, d) if e == "click" || e == "purchase" => d }
    val (d0, d1) = (days.min, days.max)
    Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
      .map(d => (daily.getOrElse(("click", d), 0L),
        daily.getOrElse(("purchase", d), 0L))).toIndexedSeq
  }

  test("xcorr_lags = brute shifted-pair Pearson for lags -7..7") {
    import graft.analytics.Series
    val xy = xySeries
    val got = Series.xcorrLags(spark, sf).collect()
    assert(got.length == 2 * Series.XcorrMaxLag + 1)
    got.foreach { r =>
      val l = r.getLong(0).toInt
      val pairs = xy.indices.flatMap { i =>
        val j = i + l
        if (j >= 0 && j < xy.length) Some((xy(i)._1, xy(j)._2)) else None
      }
      assert(r.getLong(1) == pairs.length.toLong, s"lag $l n")
      val n = pairs.length.toDouble
      val (sx, sy) = (pairs.map(_._1).sum.toDouble, pairs.map(_._2).sum.toDouble)
      val sxy = pairs.map(p => p._1 * p._2).sum.toDouble
      val sxx = pairs.map(p => p._1 * p._1).sum.toDouble
      val syy = pairs.map(p => p._2 * p._2).sum.toDouble
      val expect = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      assert(math.abs(r.getDouble(2) - expect) < 1e-4, s"lag $l r")
    }
  }

  test("rolling_corr = brute trailing-14d Pearson; |corr| <= 1") {
    import graft.analytics.Series
    val xy = xySeries
    val k = Series.RollCorrDays
    val got = Series.rollingCorr(spark, sf).collect()
    assert(got.length == math.max(0, xy.length - k + 1))
    got.zipWithIndex.foreach { case (r, idx) =>
      val w = xy.slice(idx, idx + k)
      val n = k.toDouble
      val (sx, sy) = (w.map(_._1).sum.toDouble, w.map(_._2).sum.toDouble)
      val sxy = w.map(p => p._1 * p._2).sum.toDouble
      val sxx = w.map(p => p._1 * p._1).sum.toDouble
      val syy = w.map(p => p._2 * p._2).sum.toDouble
      val dxx = n * sxx - sx * sx; val dyy = n * syy - sy * sy
      if (dxx > 0 && dyy > 0) {
        val expect = (n * sxy - sx * sy) / math.sqrt(dxx * dyy)
        assert(math.abs(r.getDouble(1) - expect) < 1e-4, s"win $idx")
        assert(math.abs(r.getDouble(1)) <= 1.0 + 1e-9)
      } else assert(r.isNullAt(1))
    }
  }

  test("holt_linear = brute paired fold; forecast = level + 7*trend") {
    import graft.analytics.Series
    val daily = dailyCounts
    val got = Series.holtLinear(spark, sf).collect()
    assert(got.nonEmpty)
    val (a, b) = (Series.HoltAlpha, Series.HoltBeta)
    got.foreach { r =>
      val et = r.getString(0)
      val days = daily.keys.collect { case (e, d) if e == et => d }
      val (d0, d1) = (days.min, days.max)
      val xs = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
        .map(d => daily.getOrElse((et, d), 0L).toDouble).toIndexedSeq
      val (l, t) = xs.tail.foldLeft((xs.head, 0.0)) { case ((l0, b0), x) =>
        val l1 = a * x + (1 - a) * (l0 + b0)
        (l1, b * (l1 - l0) + (1 - b) * b0)
      }
      assert(r.getLong(1) == xs.length.toLong)
      assert(math.abs(r.getDouble(2) - l) < 1e-3, s"$et level")
      assert(math.abs(r.getDouble(3) - t) < 1e-3, s"$et trend")
      assert(math.abs(r.getDouble(4) -
        (l + Series.HoltHorizon * t)) < 1e-3, s"$et forecast")
    }
  }

  test("theil_sen = brute pairwise-slope median on observed days") {
    import graft.analytics.Stats
    val daily = dailyCounts
    val got = Stats.theilSen(spark, sf).collect()
    assert(got.nonEmpty)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    got.foreach { r =>
      val et = r.getString(0)
      val pts = daily.collect { case ((e, d), n) if e == et => (d, n) }.toSeq
      val d0 = pts.map(_._1).min
      val tp = pts.map { case (d, n) =>
        (java.time.temporal.ChronoUnit.DAYS.between(d0, d).toDouble, n.toDouble)
      }.sortBy(_._1)
      val slopes = for {
        i <- tp.indices; j <- (i + 1) until tp.length
      } yield (tp(j)._2 - tp(i)._2) / (tp(j)._1 - tp(i)._1)
      assert(r.getLong(1) == slopes.length.toLong, s"$et pairs")
      val m = median(slopes)
      assert(math.abs(r.getDouble(2) - m) < 1e-4, s"$et slope")
      val b = median(tp.map { case (t, y) => y - m * t })
      assert(math.abs(r.getDouble(3) - b) < 1e-3, s"$et intercept")
    }
  }

  test("dispersion_report = brute Fano/peak/hour-entropy per type") {
    import graft.analytics.Series
    val daily = dailyCounts
    val hoursByType = Tables.events(spark, sf)
      .select(col("event_type"), hour(col("ts")).as("h")).collect()
      .map(r => (r.getString(0), r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = Series.dispersionReport(spark, sf).collect()
    got.foreach { r =>
      val et = r.getString(0)
      val days = daily.keys.collect { case (e, d) if e == et => d }
      val (d0, d1) = (days.min, days.max)
      val xs = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
        .map(d => daily.getOrElse((et, d), 0L).toDouble).toSeq
      val mean = xs.sum / xs.length
      val v = xs.map(x => (x - mean) * (x - mean)).sum / (xs.length - 1)
      assert(r.getLong(1) == xs.length.toLong)
      assert(math.abs(r.getDouble(2) - mean) < 1e-3)
      assert(math.abs(r.getDouble(3) - v / mean) < 1e-3, s"fano $et")
      assert(math.abs(r.getDouble(4) - xs.max / mean) < 1e-3)
      val hc = hoursByType(et).groupBy(identity).values.map(_.size).toSeq
      val n = hc.sum.toDouble
      val h = math.log(n) - hc.map(c => c * math.log(c)).sum / n
      assert(r.getLong(5) == hc.size.toLong)
      assert(math.abs(r.getDouble(6) - h) < 1e-4, s"hour entropy $et")
      assert(math.abs(r.getDouble(7) - h / math.log(24.0)) < 1e-4)
      assert(r.getDouble(7) >= 0.0 && r.getDouble(7) <= 1.0 + 1e-9)
    }
  }

  test("acf_lags = brute autocorrelation on the zero-filled spine") {
    import graft.analytics.Series
    val daily = dailyCounts
    val got = Series.acfLags(spark, sf).collect()
    val types = daily.keys.map(_._1).toSeq.distinct
    assert(got.length == types.size * Series.AcfMaxLag)
    types.foreach { et =>
      val days = daily.keys.collect { case (e, d) if e == et => d }
      val (d0, d1) = (days.min, days.max)
      val xs = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
        .map(d => daily.getOrElse((et, d), 0L).toDouble).toSeq
      val mu = xs.sum / xs.length
      val den = xs.map(x => (x - mu) * (x - mu)).sum
      (1 to Series.AcfMaxLag).foreach { l =>
        val num = (0 until xs.length - l)
          .map(t => (xs(t) - mu) * (xs(t + l) - mu)).sum
        val r = got.find(r => r.getString(0) == et && r.getLong(1) == l).get
        assert(r.getLong(2) == xs.length - l, s"n_pairs $et lag $l")
        assert(r.getLong(3) == xs.length, s"n_days $et")
        assert(math.abs(r.getDouble(4) - num / den) < 1e-4,
          s"acf($et, $l) got ${r.getDouble(4)} want ${num / den}")
      }
    }
  }
}
