package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.dq.Profile

/** §2.206–207: minhash_calibration, hll_profile — brute-force replays
  * over the collected sf0.001 tables. */
class ProfileCalibSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  test("minhash_calibration: bands partition the candidate pairs; est/exact means replayed") {
    val docs = Tables.documents(spark, sf)
    val est = Dedup.minhashPairs(docs, 0.0).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val exact = Dedup.ngramJaccardPairs(docs, 0.0).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(est.keySet === exact.keySet,
      "both estimators must score the same band-candidate pairs")
    assert(est.nonEmpty)

    val rows = Dedup.minhashCalibration(docs).collect()
    assert(rows.map(_.getLong(1)).sum === est.size.toLong,
      "decile bands must partition the candidate pair set")
    rows.foreach { r =>
      val band = r.getInt(0)
      // toSeq: keys is a Set and .map(est) over a Set would collapse
      // pairs that share the same similarity value
      val keys = est.keys.filter(k => math.floor(est(k) * 10).toInt == band).toSeq
      assert(r.getLong(1) === keys.size.toLong, s"band $band count")
      // Spark round() is HALF_UP (math.rint is half-even — wrong at .5)
      def m(vs: Iterable[Double]) = BigDecimal(vs.sum / vs.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(2) - m(keys.map(est))) < 1e-9, s"band $band est")
      assert(math.abs(r.getDouble(3) - m(keys.map(exact))) < 1e-9, s"band $band exact")
      val errs = keys.map(k => math.rint(math.abs(est(k) - exact(k)) * 1e6) / 1e6)
      assert(math.abs(r.getDouble(4) - m(errs)) < 1e-9, s"band $band err")
    }
  }

  test("hll_profile: exact distinct replayed per column; HLL within 5%") {
    val ev = Tables.events(spark, sf).select(
      col("event_id").cast("string"),
      col("user_id").cast("string"),
      col("event_type"),
      col("value").cast("decimal(18,2)").cast("string"),
      get_json_object(col("props"), "$.k")).collect()
    val nRows = ev.length.toLong
    val colVals: Map[String, Seq[String]] = Map(
      "event_id" -> ev.map(_.getString(0)).toSeq,
      "user_id" -> ev.map(_.getString(1)).toSeq,
      "event_type" -> ev.map(_.getString(2)).toSeq,
      "value" -> ev.map(_.getString(3)).toSeq,
      "item" -> ev.map(_.getString(4)).toSeq)

    val rows = Profile.hllProfile(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet === colVals.keySet)
    rows.foreach { r =>
      val name = r.getString(0)
      val vs = colVals(name)
      assert(r.getLong(1) === nRows, s"$name n_rows")
      assert(r.getLong(2) === vs.count(_ == null).toLong, s"$name n_nulls")
      val exact = vs.filter(_ != null).distinct.size.toLong
      assert(r.getLong(4) === exact, s"$name exact_distinct")
      // p=12 HLL: ~1.6% std error; 5% is > 3 sigma
      assert(math.abs(r.getDouble(3) - exact) / exact < 0.05,
        s"$name approx=${r.getDouble(3)} exact=$exact")
      assert(math.abs(r.getDouble(5) -
        math.rint((r.getDouble(3) - exact) * 100.0 / exact * 1e4) / 1e4) < 1e-9)
    }
  }

  test("k_anonymity = brute group-size/diversity audit for both QI configs") {
    import graft.dq.Privacy
    val rows = Tables.customer(spark, sf)
      .select("c_nationkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    def audit(qi: ((Int, String, Double)) => Product)
        : (Long, Long, Long, Double, Long, Long) = {
      val groups = rows.groupBy(qi).values.toSeq
      val ks = groups.map(_.length.toLong).sorted
      val med = { // same interpolation as percentile/quantile_cont
        val pos = (ks.length - 1) * 0.5
        val lo = ks(pos.toInt).toDouble
        if (pos.toInt + 1 < ks.length)
          lo + (ks(pos.toInt + 1) - lo) * (pos - pos.toInt) else lo
      }
      (groups.size.toLong, rows.length.toLong, ks.min, med,
        groups.filter(_.length < Privacy.KThreshold)
          .map(_.length.toLong).sum,
        groups.map(_.map(_._3).distinct.length.toLong).min)
    }
    val expected = Map(
      "coarse" -> audit(t => (t._1, t._2)),
      "fine" -> audit(t => (t._1, t._2, math.floor(t._3 / 1000.0).toLong)))
    val got = Privacy.kAnonymity(spark, sf).collect()
    assert(got.length == 2)
    got.foreach { r =>
      val (ng, nr, mk, med, below, ml) = expected(r.getString(0))
      assert(r.getLong(1) == ng && r.getLong(2) == nr &&
        r.getLong(3) == mk && r.getLong(5) == below && r.getLong(7) == ml,
        s"config ${r.getString(0)}")
      assert(math.abs(r.getDouble(4) - med) < 1e-4)
      assert(math.abs(r.getDouble(6) - below.toDouble / nr) < 1e-4)
    }
    // the fine view can only fragment groups: risk never decreases
    val byCfg = got.map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(byCfg("fine") >= byCfg("coarse"))
  }
}
