package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-12 operators (§2.354–358) vs independent brute-force replays
  * at sf0.01 — the house recipe's spec leg next to the DuckDB oracle. */
class R12OpsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  private def eventCents(): Map[String, Seq[Long]] =
    Tables.events(spark, sf)
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)"))
      .collect().groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.map(_.getLong(1)).toSeq.sorted }

  test("trimmed_mean equals the sorted-and-sliced definition") {
    val got = analytics.Robust.trimmedMean(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val cents = eventCents()
    for ((t, xs) <- cents) {
      val n = xs.size
      val k = n / 10
      val kept = xs.slice(k, n - k)
      val want = java.math.BigDecimal
        .valueOf(kept.sum.toDouble / (kept.size * 100.0))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      val (gn, gk, gm) = got(t)
      assert(gn == n && gk == k, s"$t counts")
      assert(math.abs(gm - want) < 1e-9, s"$t trimmed mean: $gm vs $want")
    }
  }

  test("tukey_fences equals the order-statistic definition") {
    val got = analytics.Robust.tukeyFences(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6), r.getLong(7))).toMap
    val cents = eventCents()
    for ((t, xs) <- cents) {
      val n = xs.size
      // quantile_disc: min v with cume_dist >= q, i.e. the ceil(q*n)-th
      // order statistic
      def qd(q: Double): Long = xs(math.ceil(q * n).toInt - 1)
      val (q1c, q3c) = (qd(0.25), qd(0.75))
      val iqrc = q3c - q1c
      val (lo2, hi2) = (2 * q1c - 3 * iqrc, 2 * q3c + 3 * iqrc)
      val nOut = xs.count(v => 2 * v < lo2 || 2 * v > hi2).toLong
      val (g1, g3, gi, glo, ghi, gn) = got(t)
      assert(g1 == q1c / 100.0 && g3 == q3c / 100.0, s"$t quartiles")
      assert(gi == iqrc / 100.0, s"$t iqr")
      assert(glo == lo2 / 200.0 && ghi == hi2 / 200.0, s"$t fences")
      assert(gn == nOut, s"$t outliers: $gn vs $nOut")
    }
  }

  test("hill_tail equals the top-k order-statistic definition") {
    val got = analytics.Robust.hillTail(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val k = analytics.Robust.HillK
    // total order (cents desc, event_id asc) replayed in Scala
    val byType = Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      .filter(col("v") > 0).collect()
      .groupBy(_.getString(0))
    for ((t, rs) <- byType) {
      val ordered = rs.map(r => (r.getLong(2), r.getLong(1)))
        .sortBy { case (v, id) => (-v, id) }
      if (ordered.size >= k + 1) {
        def li(x: Long): Long = math.round(1e9 * math.log(x.toDouble))
        val lik = li(ordered(k)._1)
        val s = ordered.take(k).map(p => li(p._1) - lik).sum
        val want = java.math.BigDecimal.valueOf(s.toDouble / (k * 1.0e9))
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        val (gk, gh) = got(t)
        assert(gk == k.toLong, s"$t k_used")
        assert(math.abs(gh - want) < 1e-9, s"$t hill: $gh vs $want")
      } else assert(!got.contains(t), s"$t lacks k+1 points yet reported")
    }
  }

  test("dedup_url: canonical is group min; verdicts and sizes consistent") {
    val out = text.Urls.dedupUrl(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.length.toLong == nDocs, "one verdict per doc")
    val byCanon = out.groupBy(_.getString(1))
    for ((_, rs) <- byCanon) {
      val ids = rs.map(_.getLong(0))
      val canon = rs.map(_.getLong(2)).distinct.toSeq
      assert(canon == Seq(ids.min), "canonical must be the group min")
      assert(rs.forall(_.getLong(3) == rs.length.toLong), "group_size")
      assert(rs.forall(r => r.getBoolean(4) == (r.getLong(0) != ids.min)),
        "is_duplicate verdicts")
    }
  }

  test("chao1_vocab equals the Scala token-count definition") {
    val got = text.CorpusOps.chao1Vocab(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), lower(col("text"))).collect()
    val counts = docs.groupBy(_.getString(0)).map { case (lang, rs) =>
      lang -> rs.flatMap(_.getString(1).trim.split("\\s+"))
        .filter(_.nonEmpty).groupBy(identity).map(_._2.length)
    }
    for ((lang, cs) <- counts) {
      val (v, f1, f2, n) =
        (cs.size.toLong, cs.count(_ == 1).toLong, cs.count(_ == 2).toLong,
          cs.sum.toLong)
      val chao = java.math.BigDecimal
        .valueOf(v + f1.toDouble * (f1 - 1) / ((f2 + 1) * 2.0))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      val (gn, gv, gf1, gf2, gchao) = got(lang)
      assert((gn, gv, gf1, gf2) == ((n, v, f1, f2)), s"$lang counts")
      assert(math.abs(gchao - chao) < 1e-9, s"$lang chao1")
    }
  }
}
