package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Brute-force replays for the round-8 eighth-push operators:
  * hash_uniformity, tail_risk, slo_burn.
  */
class Round8hSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("hash_uniformity = brute chi2 replay per config") {
    val sf = SparkTestSession.sf
    val users = Tables.events(spark, sf)
      .select("user_id").distinct()
      .withColumn("h",
        graft.text.TextFunctions.hash64(
          concat_ws(":", lit("hu"), col("user_id"))))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = users.length.toLong
    def replay(buckets: Array[Long]): (Long, Double, Double, Double) = {
      val cells = buckets.groupBy(identity).view.mapValues(_.length.toLong)
      val k = cells.size.toLong
      val e = n.toDouble / k
      val chi2 = cells.values.map { o =>
        math.round((o - e) * (o - e) / e * 1e6) }.sum / 1e6
      (k, chi2, cells.values.max.toDouble / n, cells.values.min.toDouble / n)
    }
    val want = Map(
      "parity_2" -> replay(users.map(_._1 % 2)),
      "hash_100" -> replay(users.map(u => ((u._2 % 100) + 100) % 100)))
    val got = graft.analytics.Stats.hashUniformity(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("hash_100", "parity_2"))
    got.foreach { r =>
      val (k, chi2, mx, mn) = want(r.getString(0))
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == k, s"k ${r.getString(0)}")
      assert(math.abs(r.getDouble(3) - chi2) < 1e-4, s"chi2 ${r.getString(0)}")
      assert(r.getLong(4) == k - 1)
      assert(math.abs(r.getDouble(5) - mx) < 1e-5)
      assert(math.abs(r.getDouble(6) - mn) < 1e-5)
    }
  }

  test("tail_risk = brute sorted-tail replay; CVaR >= VaR") {
    val sf = SparkTestSession.sf
    val rev = Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
      .join(Tables.customer(spark, sf)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        "o_custkey")
      .select("c_mktsegment", "cents")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val got = graft.analytics.Mining.tailRisk(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq == rev.keys.toSeq.sorted)
    got.foreach { r =>
      val xs = rev(r.getString(0))
      val n = xs.length.toLong
      // VaR: smallest value whose 1-based cumulative rank covers 95%
      val varIdx = xs.indices.find(i => (i + 1) * 100L >= 95L * n).get
      val tail = xs.drop((n * 95 / 100).toInt)
      assert(r.getLong(1) == n)
      assert(math.abs(r.getDouble(2) - xs(varIdx) / 100.0) < 1e-6, "VaR")
      assert(r.getLong(4) == tail.length.toLong, "n_tail")
      assert(math.abs(r.getDouble(3) -
        tail.map(BigInt(_)).sum.toDouble / 100.0 / tail.length) < 1e-3,
        "CVaR")
      assert(r.getDouble(3) >= r.getDouble(2) - 1e-9, "CVaR >= VaR")
      val share = tail.map(BigInt(_)).sum.toDouble /
        xs.map(BigInt(_)).sum.toDouble
      assert(math.abs(r.getDouble(5) - share) < 1e-5, "tail share")
    }
  }

  test("slo_burn = brute trailing-window replay; flags consistent") {
    val sf = SparkTestSession.sf
    val days = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("errs"))
      .orderBy("day")
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
    val b = graft.analytics.Growth.SloErrShare
    val got = graft.analytics.Growth.sloBurn(spark, sf).collect()
    assert(got.length == days.length)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getTimestamp(0).toLocalDateTime.toLocalDate == days(i)._1)
      assert(r.getLong(1) == days(i)._2 && r.getLong(2) == days(i)._3)
      def trail(k: Int, f: ((java.time.LocalDate, Long, Long)) => Long) =
        days.slice(math.max(0, i - k + 1), i + 1).map(f).sum
      val b1 = days(i)._3.toDouble / days(i)._2 / b
      val b7 = trail(7, _._3).toDouble / trail(7, _._2) / b
      val b28 = trail(28, _._3).toDouble / trail(28, _._2) / b
      assert(math.abs(r.getDouble(3) - b1) < 1e-5, s"burn_1d day $i")
      assert(math.abs(r.getDouble(4) - b7) < 1e-5, s"burn_7d day $i")
      assert(math.abs(r.getDouble(5) - b28) < 1e-5, s"burn_28d day $i")
      val bc = trail(10000, _._3).toDouble / (trail(10000, _._2) * b)
      assert(math.abs(r.getDouble(6) - bc) < 1e-5, s"budget day $i")
      assert(r.getBoolean(7) ==
        (r.getDouble(3) >= 2.0 && r.getDouble(4) >= 2.0))
      assert(r.getBoolean(8) ==
        (r.getDouble(4) >= 1.0 && r.getDouble(5) >= 1.0))
    }
  }
}
