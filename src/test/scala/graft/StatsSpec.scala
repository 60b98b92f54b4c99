package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analytics.Stats

/** §2.208–210: ab_test_ttest, mann_whitney, bootstrap_ci — brute-force
  * statistical replays over the collected sf0.001 events. */
class StatsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  private def clickValues: (Seq[Double], Seq[Double]) = {
    val rows = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select("user_id", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    (rows.filter(_._1 % 2 == 0).map(_._2).toSeq,
     rows.filter(_._1 % 2 != 0).map(_._2).toSeq)
  }

  test("ab_test_ttest = textbook Welch on collected arms") {
    val (a, b) = clickValues
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    def varS(xs: Seq[Double]) = {
      val m = mean(xs)
      xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    val se2 = varS(a) / a.size + varS(b) / b.size
    val t = (mean(a) - mean(b)) / math.sqrt(se2)
    val df = se2 * se2 / (
      math.pow(varS(a) / a.size, 2) / (a.size - 1) +
      math.pow(varS(b) / b.size, 2) / (b.size - 1))

    val r = Stats.abTestTtest(spark, sf).collect().head
    assert(r.getLong(0) === a.size.toLong)
    assert(r.getLong(1) === b.size.toLong)
    assert(math.abs(r.getDouble(2) - mean(a)) < 1e-4)
    assert(math.abs(r.getDouble(3) - mean(b)) < 1e-4)
    assert(math.abs(r.getDouble(6) - t) < 1e-3, s"t: got ${r.getDouble(6)} want $t")
    assert(math.abs(r.getDouble(7) - df) < 0.5, s"df: got ${r.getDouble(7)} want $df")
    assert(r.getBoolean(8) === (math.abs(r.getDouble(6)) > 1.96))
  }

  test("mann_whitney = brute ranks with average ties + tie-corrected z") {
    val rows = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view"))
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val all = rows.map(_._2).sorted
    // average rank per value (1-based)
    val rankOf: Map[Double, Double] = all.zipWithIndex
      .groupBy(_._1).view
      .mapValues(g => g.map(_._2 + 1.0).sum / g.size).toMap
    val aRanks = rows.filter(_._1 == "click").map(r => rankOf(r._2))
    val nA = aRanks.size.toLong
    val nB = rows.count(_._1 == "view").toLong
    val u = aRanks.sum - nA * (nA + 1) / 2.0
    val n = nA + nB
    val t3t = all.groupBy(identity).values
      .map(g => math.pow(g.size, 3) - g.size).sum
    val sigma = math.sqrt(nA.toDouble * nB / 12.0 *
      ((n + 1).toDouble - t3t / (n.toDouble * (n - 1))))
    val z = (u - nA.toDouble * nB / 2.0) / sigma

    val r = Stats.mannWhitney(spark, sf).collect().head
    assert(r.getLong(0) === nA)
    assert(r.getLong(1) === nB)
    assert(math.abs(r.getDouble(2) - u) < 1e-6, s"U: got ${r.getDouble(2)} want $u")
    assert(math.abs(r.getDouble(3) - z) < 1e-3, s"z: got ${r.getDouble(3)} want $z")
  }

  test("bootstrap_ci: weights replayed, CI brackets the mean, reps deterministic") {
    import graft.text.TextFunctions.hash64
    val base = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select("event_id", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val cdf = Stats.PoissonCdf
    // per-row base hash replayed through Spark's md5 expression, then
    // the affine per-rep uniforms recomputed independently in Scala
    val hp = graft.functions.HashConstants.P
    val hashed = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select(col("event_id"),
        hash64(col("event_id").cast("string")).as("h"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1) % hp)).toMap
    val means = (0 until Stats.BootstrapReps).map { rep =>
      var sw = 0.0; var swx = 0.0
      base.foreach { case (id, x) =>
        val k = ((1103515245L + 997L * rep) * hashed(id) +
          12345L + 7919L * rep) % hp
        val u = k.toDouble / hp.toDouble
        val w = cdf.count(t => u >= t)
        sw += w; swx += w * x
      }
      BigDecimal(swx / sw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val sortedMeans = means.zipWithIndex
      .sortBy { case (m, rep) => (m, rep) }.map(_._1)

    val r = Stats.bootstrapCi(spark, sf).collect().head
    assert(r.getLong(0) === base.length.toLong)
    assert(r.getLong(4) === Stats.BootstrapReps.toLong)
    assert(math.abs(r.getDouble(2) - sortedMeans(1)) < 1e-9, "ci_lo = rank-2 mean")
    assert(math.abs(r.getDouble(3) - sortedMeans(Stats.BootstrapReps - 2)) < 1e-9,
      "ci_hi = rank-63 mean")
    assert(r.getDouble(2) < r.getDouble(1) && r.getDouble(1) < r.getDouble(3),
      "CI must bracket the full-sample mean")
  }

  test("funnel_significance = brute two-proportion z on signup->purchase arms") {
    val rows = Tables.events(spark, sf)
      .filter(col("event_type").isin("signup", "purchase"))
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime))
    val firstSignup = rows.filter(_._2 == "signup")
      .groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    val winMs = Stats.ConvWindowDays * 86400000L
    val converted = rows.filter(_._2 == "purchase").filter { case (u, _, t) =>
      firstSignup.get(u).exists(s => t > s && t <= s + winMs)
    }.map(_._1).toSet
    def arm(sel: Long => Boolean) = {
      val us = firstSignup.keys.filter(sel).toSeq
      (us.size.toLong, us.count(converted).toLong)
    }
    val (na, ka) = arm(_ % 2 == 0)
    val (nb, kb) = arm(_ % 2 != 0)
    val (pa, pb) = (ka.toDouble / na, kb.toDouble / nb)
    val pp = (ka + kb).toDouble / (na + nb)
    val z = (pa - pb) / math.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb))

    val r = Stats.funnelSignificance(spark, sf).collect().head
    assert(r.getLong(0) === na); assert(r.getLong(1) === ka)
    assert(r.getLong(2) === nb); assert(r.getLong(3) === kb)
    assert(math.abs(r.getDouble(6) - z) < 1e-3, s"z got ${r.getDouble(6)} want $z")
    assert(r.getBoolean(7) === (math.abs(r.getDouble(6)) > 1.96))
  }

  test("pareto_report = brute concentration curve; shares monotone") {
    val counts = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select(get_json_object(col("props"), "$.k").cast("bigint").as("item"))
      .filter(col("item").isNotNull)
      .collect().map(_.getLong(0))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ranked = counts.toSeq.sortBy { case (item, n) => (-n, item) }.map(_._2)
    val total = ranked.sum.toDouble

    val got = analytics.Mining.paretoReport(spark, sf).collect()
    assert(got.map(_.getInt(0)).toSeq === Seq(1, 5, 10, 25))
    got.foreach { r =>
      val topN = math.max(1L,
        math.floor(counts.size * r.getInt(0) / 100.0).toLong)
      assert(r.getLong(1) === topN, s"top_n at ${r.getInt(0)}%")
      assert(r.getLong(2) === counts.size.toLong)
      val share = ranked.take(topN.toInt).sum / total
      assert(math.abs(r.getDouble(4) - share) < 1e-6, s"share at ${r.getInt(0)}%")
    }
    // concentration curve must be monotone nondecreasing
    assert(got.map(_.getDouble(4)).sliding(2).forall(p => p(1) >= p(0)))
  }

  test("PoissonCdf is a valid CDF with mean-1 weights") {
    assert(Stats.PoissonCdf.length === 8)
    assert(Stats.PoissonCdf.sliding(2).forall(p => p(1) > p(0)))
    assert(math.abs(Stats.PoissonCdf.head - math.exp(-1.0)) < 1e-6)
    assert(Stats.PoissonCdf.last > 0.99998) // P(w > 8) ≈ 1e-5 truncated
    // E[w] under the discretized CDF = sum over k of P(w > k) = sum(1 - cdf)
    val ew = Stats.PoissonCdf.map(1.0 - _).sum
    assert(math.abs(ew - 1.0) < 1e-3, s"E[w] = $ew")
  }

  test("ab_test_multi = per-type Welch z + BH step-up replay") {
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    def welch(et: String): (Long, Long, Double) = {
      val cents = rows.filter(_._1 == et)
        .map(r => (r._2 % 2 == 0, math.round(r._3 * 100)))
      val a = cents.filter(_._1).map(_._2)
      val b = cents.filterNot(_._1).map(_._2)
      def mv(xs: Array[Long]): (Double, Double) = {
        val m = xs.sum.toDouble / xs.length / 100.0
        val v = xs.map(x => (x / 100.0 - m) * (x / 100.0 - m)).sum /
          (xs.length - 1)
        (m, v)
      }
      val ((ma, va), (mb, vb)) = (mv(a), mv(b))
      (a.length.toLong, b.length.toLong,
        (ma - mb) / math.sqrt(va / a.length + vb / b.length))
    }
    val types = rows.map(_._1).distinct.sorted
    val zs = types.map(et => et -> welch(et)).toMap
    val got = Stats.abTestMulti(spark, sf).collect()
    assert(got.length == types.length)
    got.foreach { r =>
      val (na, nb, z) = zs(r.getString(0))
      assert(r.getLong(1) == na && r.getLong(2) == nb)
      assert(math.abs(r.getDouble(5) - z) < 1e-3, s"z for ${r.getString(0)}")
      assert(r.getBoolean(8) == (math.abs(r.getDouble(5)) > 1.96))
    }
    // BH step-up replay over the engine's own (rounded) z values
    val byRank = got.sortBy(_.getInt(6))
    val pass = byRank.zipWithIndex.collect {
      case (r, i) if math.abs(r.getDouble(5)) >= Stats.BhCritZ(i) => i + 1
    }
    val iStar = if (pass.isEmpty) 0 else pass.max
    byRank.zipWithIndex.foreach { case (r, i) =>
      assert(r.getBoolean(9) == (i + 1 <= iStar), s"sig_bh rank ${i + 1}")
    }
    // BH never rejects fewer than... sanity: sig_bh implies |z| can be
    // below 1.96 only via the step-up, never above crit(1) unrejected
    if (iStar >= 1)
      assert(math.abs(byRank.head.getDouble(5)) >= Stats.BhCritZ(iStar - 1))
  }

  test("target_encode = brute smoothed encoding; LOO sd = sd/(n-1)") {
    import graft.analytics.Features
    val cust = Tables.customer(spark, sf)
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val orders = Tables.orders(spark, sf)
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (cust(r.getLong(0)), math.round(r.getDouble(1) * 100)))
    val prior = orders.map(_._2).sum.toDouble / orders.length / 100.0
    val got = graft.analytics.Features.targetEncode(spark, sf).collect()
    val byCat = orders.groupBy(_._1)
    assert(got.length == byCat.size)
    got.foreach { r =>
      val xs = byCat(r.getString(0)).map(_._2)
      val n = xs.length
      assert(r.getLong(1) == n.toLong)
      val mean = xs.sum.toDouble / n / 100.0
      assert(math.abs(r.getDouble(2) - mean) < 1e-3)
      val smoothed = (mean * n + prior * Features.SmoothM) /
        (n + Features.SmoothM)
      assert(math.abs(r.getDouble(3) - smoothed) < 1e-3)
      val sd = math.sqrt(xs.map(x => (x / 100.0 - mean) * (x / 100.0 - mean))
        .sum / (n - 1))
      assert(math.abs(r.getDouble(4) - sd / (n - 1)) < 1e-4)
      // shrinkage: smoothed sits between the raw mean and the prior
      assert((smoothed - mean) * (smoothed - prior) <= 1e-9)
    }
  }

  test("cohort_ltv = brute cohort revenue accumulation; cells partition revenue") {
    val orders = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderdate", "o_totalprice").collect()
      .map(r => (r.getLong(0),
        r.getAs[java.sql.Timestamp](1).toLocalDateTime.getYear,
        math.round(r.getDouble(2) * 100)))
    val firstYr = orders.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val cells = orders.groupBy(o => (firstYr(o._1), o._2 - firstYr(o._1)))
      .view.mapValues(_.map(_._3).sum).toMap
    val sizes = firstYr.values.groupBy(identity).view.mapValues(_.size).toMap
    val got = graft.analytics.Cohorts.cohortLtv(spark, sf).collect()
    assert(got.length == cells.size)
    val byCohort = got.groupBy(_.getInt(0))
    byCohort.foreach { case (cy, rs) =>
      var cum = 0L
      rs.sortBy(_.getInt(1)).foreach { r =>
        val rev = cells((cy, r.getInt(1)))
        cum += rev
        assert(r.getLong(2) == sizes(cy).toLong, "cohort size")
        assert(math.abs(r.getDouble(3) - rev / 100.0) < 1e-6)
        assert(math.abs(r.getDouble(4) - cum / 100.0) < 1e-6)
        assert(math.abs(r.getDouble(5) - cum / 100.0 / sizes(cy)) < 1e-3)
      }
    }
    // every order dollar lands in exactly one cell
    assert(math.abs(got.map(_.getDouble(3)).sum -
      orders.map(_._3).sum / 100.0) < 1e-4)
  }
}
