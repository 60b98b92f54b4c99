package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Brute-force replays for the round-8 seventh-push operators:
  * rank_movers, loo_source_impact, upsert_amplification.
  */
class Round8gSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("rank_movers = brute half-split rank replay") {
    val sf = SparkTestSession.sf
    val ev = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select(get_json_object(col("props"), "$.k").cast("bigint").as("item"),
        to_date(col("ts")).as("day"))
      .filter(col("item").isNotNull)
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val d0 = ev.map(_._2).min
    val d1 = ev.map(_._2).max
    val half = (java.time.temporal.ChronoUnit.DAYS.between(d0, d1) / 2).toInt
    val items = ev.groupBy(_._1).view.mapValues { es =>
      val h1 = es.count(e =>
        java.time.temporal.ChronoUnit.DAYS.between(d0, e._2) < half).toLong
      (h1, es.length - h1)
    }.toMap
    def ranks(key: Long => Long): Map[Long, Long] =
      items.keys.toSeq
        .sortBy(i => (-key(i), i))
        .zipWithIndex.map { case (i, r) => i -> (r + 1).toLong }.toMap
    val r1 = ranks(i => items(i)._1)
    val r2 = ranks(i => items(i)._2)
    val want = items.keys.toSeq
      .sortBy(i => (-math.abs(r1(i) - r2(i)), i))
      .take(graft.analytics.Growth.MoversTopK)
    val got = graft.analytics.Growth.rankMovers(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSeq == want)
    got.foreach { r =>
      val i = r.getLong(0)
      assert(r.getLong(1) == items(i)._1 && r.getLong(2) == items(i)._2)
      assert(r.getLong(3) == r1(i) && r.getLong(4) == r2(i))
      assert(r.getLong(5) == r1(i) - r2(i))
    }
  }

  test("loo_source_impact = brute LOO replay; impacts consistent") {
    val sf = SparkTestSession.sf
    val rows = graft.text.TextQueries
      .qualityFrame(Tables.documents(spark, sf))
      .select(col("source"),
        round(col("quality_score") * 1000000).cast("long"),
        col("n_tokens").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val tn = rows.length.toLong
    val ts = rows.map(_._2).sum
    val bySrc = rows.groupBy(_._1)
    val got = graft.text.CorpusOps.looSourceImpact(spark, sf)
      .collect()
    assert(got.map(_.getString(0)).toSeq == bySrc.keys.toSeq.sorted)
    got.foreach { r =>
      val src = bySrc(r.getString(0))
      val n = src.length.toLong
      val ss = src.map(_._2).sum
      assert(r.getLong(1) == n)
      assert(math.abs(r.getDouble(3) - ss.toDouble / 1e6 / n) < 1e-5)
      val loo = (ts - ss).toDouble / 1e6 / (tn - n)
      assert(math.abs(r.getDouble(4) - loo) < 1e-5, "loo_quality")
      assert(math.abs(r.getDouble(5) -
        (ts.toDouble / 1e6 / tn - loo)) < 1e-6, "quality_impact")
    }
    // impacts are anchored to one overall mean: n-weighted LOO means
    // recombine to it
    val overall = ts.toDouble / 1e6 / tn
    got.foreach { r =>
      val n = r.getLong(1)
      val m = r.getDouble(3)
      val loo = r.getDouble(4)
      val recon = (loo * (tn - n) + m * n) / tn
      assert(math.abs(recon - overall) < 1e-5, "mixture identity")
    }
  }

  test("upsert_amplification = brute daily replay; amp >= 1") {
    val sf = SparkTestSession.sf
    val cells = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"),
        (col("user_id") % graft.etl.Layout.UpsertBuckets).as("b"))
      .groupBy("day", "b").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
    val days = cells.map(_._1).distinct.sorted
    var bucketSize = Map.empty[Long, Long].withDefaultValue(0L)
    val want = days.map { d =>
      val batch = cells.filter(_._1 == d)
      val rewritten = batch.map(t => bucketSize(t._2) + t._3).sum
      batch.foreach(t => bucketSize += t._2 -> (bucketSize(t._2) + t._3))
      (d, batch.map(_._3).sum, batch.length.toLong, rewritten)
    }
    val got = graft.etl.Layout.upsertAmplification(spark, sf).collect()
    assert(got.length == days.length)
    got.zip(want).foreach { case (r, (d, batch, nb, rew)) =>
      assert(r.getTimestamp(0).toLocalDateTime.toLocalDate == d)
      assert(r.getLong(1) == batch, s"batch $d")
      assert(r.getLong(2) == nb, s"buckets $d")
      assert(r.getLong(3) == rew, s"rewritten $d")
      assert(r.getDouble(4) >= 1.0 - 1e-9, "amp >= 1")
    }
    // first day rewrites exactly its own batch; cum amp non-trivial after
    assert(got.head.getLong(3) == got.head.getLong(1))
    assert(got.last.getDouble(5) >= got.head.getDouble(5) - 1e-9)
  }
}
