package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Brute-force replays for the round-8 batch-2 operators
  * (§2.278–284). */
class Round8BatchSpec extends AnyFunSuite {
  import SparkTestSession.spark

  val sf: String = SparkTestSession.sf

  // ---- shared brute replays -------------------------------------------

  /** JVM mirror of TextFunctions: normalize → tokens → per-token poly
    * hash → k-gram combined hashes. */
  private def gramHashes(text: String, k: Int): Array[Long] = {
    val M = 1000000007L
    val toks = text.toLowerCase.replaceAll("[^a-z0-9 ]", "")
      .trim.split("\\s+")
    val th = toks.map(_.foldLeft(0L)((a, c) => (a * 131 + c.toLong) % M))
    if (th.length < k) Array.empty
    else (0 to th.length - k).map(i =>
      (0 until k).foldLeft(0L)((a, j) => (a * 131 + th(i + j)) % M)).toArray
  }

  /** Brute winnowing: selected 1-based positions per the min-of-
    * (h·2²²+p) rule over full windows. */
  private def winnowSelect(h: Array[Long], w: Int): Set[Int] = {
    if (h.isEmpty) return Set.empty
    val hc = h.zipWithIndex.map { case (x, i) => (x * 4194304L + (i + 1), i + 1) }
    val lastStart = math.max(h.length - w + 1, 1)
    (1 to lastStart).map { j =>
      hc.slice(j - 1, math.min(j - 1 + w, h.length)).min._2
    }.toSet
  }

  private def sessionsOf(rows: Seq[(Long, Long, String, Long)])
    : Seq[Seq[(Long, Long, String, Long)]] = {
    // rows: (user, us, type, event_id) → sessions by 30-min gap
    val gap = graft.streaming.Streaming.SessionGapMinutes * 60L * 1000000L
    rows.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._4))
      val out = scala.collection.mutable.ArrayBuffer[
        scala.collection.mutable.ArrayBuffer[(Long, Long, String, Long)]]()
      var prev = Long.MinValue
      sorted.foreach { e =>
        if (prev == Long.MinValue || e._2 - prev > gap)
          out += scala.collection.mutable.ArrayBuffer(e)
        else out.last += e
        prev = e._2
      }
      out.map(_.toSeq).toSeq
    }
  }

  private def eventRows: Seq[(Long, Long, String, Long)] =
    Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSeq

  // ---- dedup_winnow ----------------------------------------------------

  test("dedup_winnow = brute winnowing + df-capped pair counting") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val fps: Map[Long, Set[Long]] = docs.map { case (id, text) =>
      val h = gramHashes(text, dedup.Winnow.WinnowK)
      id -> winnowSelect(h, dedup.Winnow.WinnowW).map(p => h(p - 1))
    }.toMap
    val df = fps.toSeq.flatMap { case (id, s) => s.map(_ -> id) }
      .groupBy(_._1).map { case (h, xs) => h -> xs.map(_._2).toSet }
    val keep = df.filter { case (_, ds) =>
      ds.size >= 2 && ds.size <= dedup.Winnow.WinnowDfCap }
    val pairCounts = scala.collection.mutable.Map[(Long, Long), Long]()
    keep.values.foreach { ds =>
      val sorted = ds.toSeq.sorted
      for (i <- sorted.indices; j <- i + 1 until sorted.length)
        pairCounts((sorted(i), sorted(j))) =
          pairCounts.getOrElse((sorted(i), sorted(j)), 0L) + 1
    }
    val expected = pairCounts.filter(_._2 >= dedup.Winnow.WinnowMinShared)
    val got = dedup.Winnow.dedupWinnow(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (a, b, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(expected((a, b)) == n, s"pair ($a,$b)")
      val jac = n.toDouble / (fps(a).size + fps(b).size - n)
      assert(math.abs(r.getDouble(3) - jac) < 1e-5, s"jaccard ($a,$b)")
    }
  }

  test("winnowing guarantee: a shared run of >= w+k-1 tokens is caught") {
    val w = dedup.Winnow.WinnowW; val k = dedup.Winnow.WinnowK
    // any shared token run of length w+k-1 shares w consecutive grams,
    // and winnowing picks at least one fingerprint from every w-window
    val shared = (1 to (w + k - 1)).map(i => s"shared$i").mkString(" ")
    val a = s"alpha beta gamma $shared delta epsilon"
    val b = s"one two three four five $shared six seven"
    val ha = gramHashes(a, k); val hb = gramHashes(b, k)
    val fa = winnowSelect(ha, w).map(p => ha(p - 1))
    val fb = winnowSelect(hb, w).map(p => hb(p - 1))
    assert((fa & fb).nonEmpty, "shared run must yield a shared fingerprint")
  }

  // ---- nelson_aalen ----------------------------------------------------

  test("nelson_aalen: risk sets match KM; hazard cumulates; Breslow >= KM") {
    val km = analytics.Survival.survivalKm(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(4))))
      .toMap
    val na = analytics.Survival.nelsonAalen(spark, sf).collect()
    assert(na.length == km.size)
    var prev = -1.0
    na.foreach { r =>
      val t = r.getLong(0)
      val (nRisk, nConv, kmS) = km(t)
      assert(r.getLong(1) == nRisk && r.getLong(2) == nConv, s"risk set t=$t")
      val h = r.getDouble(4)
      assert(h >= prev - 1e-9, s"cum_hazard must be nondecreasing at t=$t")
      prev = h
      // 1 - x <= exp(-x) per factor => S_KM <= exp(-H) (Breslow)
      assert(r.getDouble(5) >= kmS - 1e-4, s"Breslow >= KM at t=$t")
    }
  }

  // ---- seq_patterns ----------------------------------------------------

  test("seq_patterns = brute session trigram counts") {
    val tri = scala.collection.mutable.Map[String, Long]()
    sessionsOf(eventRows).foreach { s =>
      s.sortBy(e => (e._2, e._4)).map(_._3).sliding(3).foreach { g =>
        if (g.length == 3) {
          val p = g.mkString(">")
          tri(p) = tri.getOrElse(p, 0L) + 1
        }
      }
    }
    val tot = tri.values.sum
    val expected = tri.toSeq.sortBy { case (p, n) => (-n, p) }
      .take(analytics.Sequences.SeqTopK)
    val got = analytics.Sequences.seqPatterns(spark, sf).collect()
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (r, (p, n)) =>
      assert(r.getString(1) == p && r.getLong(2) == n, s"rank ${r.getInt(0)}")
      assert(math.abs(r.getDouble(3) - n.toDouble / tot) < 1e-5)
    }
  }

  // ---- mix_shift -------------------------------------------------------

  test("mix_shift: brute cells; volume + rate bridges to delta exactly") {
    val cust = Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val orders = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderdate", "o_totalprice").collect()
      .map(r => (r.getLong(0),
        r.getTimestamp(1).toLocalDateTime.toLocalDate.toEpochDay,
        math.round(r.getDouble(2) * 100)))
    val d0 = orders.map(_._2).min
    val half = (orders.map(_._2).max - d0) / 2
    val cells = orders.groupBy(o =>
      (cust(o._1), if (o._2 - d0 < half) 1 else 2))
    val got = analytics.MixShift.mixShift(spark, sf).collect()
    got.foreach { r =>
      val seg = r.getString(0)
      val (n1, c1) = { val v = cells((seg, 1)); (v.length.toLong, v.map(_._3).sum) }
      val (n2, c2) = { val v = cells((seg, 2)); (v.length.toLong, v.map(_._3).sum) }
      assert(r.getLong(1) == n1 && r.getLong(2) == n2, s"$seg counts")
      assert(math.abs(r.getDouble(5) - (c2 - c1) / 100.0) < 0.011, s"$seg delta")
      // the bridge: volume + rate = delta (exact algebra, float rounding)
      assert(math.abs(r.getDouble(6) + r.getDouble(7) -
        (c2 - c1) / 100.0) < 2e-4, s"$seg bridge")
    }
  }

  // ---- quantile_normalize ----------------------------------------------

  test("quantile_normalize = brute pooled-ECDF lookup; monotone per source") {
    val docs = Tables.documents(spark, sf).select("source", "n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val nPool = docs.length.toLong
    val poolSorted = docs.map(_._2).sorted
    def cumPool(v: Long): Long = poolSorted.count(_ <= v).toLong
    val poolVals = poolSorted.distinct
    val got = pipeline.Normalize.quantileNormalize(spark, sf).collect()
    val bySource = docs.groupBy(_._1)
    got.groupBy(_.getString(0)).foreach { case (src, rows) =>
      val vals = bySource(src).map(_._2)
      val nSrc = vals.length.toLong
      var prevQ = Long.MinValue
      rows.sortBy(_.getLong(1)).foreach { r =>
        val v = r.getLong(1)
        val rank = vals.count(_ <= v).toLong
        assert(r.getLong(2) == vals.count(_ == v).toLong, s"$src/$v n_rows")
        val expectQ = poolVals.find(u => cumPool(u) * nSrc >= rank * nPool).get
        assert(r.getLong(3) == expectQ, s"$src/$v q_value")
        assert(r.getLong(3) >= prevQ, s"$src/$v monotone")
        prevQ = r.getLong(3)
      }
    }
  }

  // ---- rank_fusion -----------------------------------------------------

  test("rank_fusion = brute RRF over the two component rankings") {
    val emb = Tables.embeddings(spark, sf)
    val ex = ann.Ann.bruteForceTopK(emb, k = ann.Fusion.FuseDepth).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(1).toLong).toMap
    val sq = ann.Ann.sq8TopK(emb, k = ann.Fusion.FuseDepth).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(1).toLong).toMap
    val keys = (ex.keySet ++ sq.keySet).toSeq
    val rrf = keys.map { k =>
      val s = ex.get(k).map(r => 1.0 / (ann.Fusion.RrfK + r)).getOrElse(0.0) +
        sq.get(k).map(r => 1.0 / (ann.Fusion.RrfK + r)).getOrElse(0.0)
      k -> BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val expected = keys.groupBy(_._1).map { case (q, ks) =>
      q -> ks.sortBy(k => (-rrf(k), k._2)).take(ann.Fusion.FuseTopK)
    }
    val got = ann.Fusion.rankFusion(spark, sf).collect()
    got.foreach { r =>
      val (q, rk, v) = (r.getLong(0), r.getInt(1), r.getLong(2))
      assert(expected(q)(rk - 1)._2 == v, s"q=$q rk=$rk")
      assert(math.abs(r.getDouble(3) - rrf((q, v))) < 1e-5)
    }
  }

  // ---- streaming winnow dedup --------------------------------------------

  test("streaming winnow dedup = brute cumulative-index replay") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-wsi").toString
    val all = Tables.documents(spark, sf).select("doc_id", "text")
    val b1 = all.filter(col("doc_id") % 2 === 0)
      .as[(Long, String)].collect().toSeq
    // batch 2: exact copies of batch 1 (fresh ids) + the odd half
    val b2 = b1.map { case (id, t) => (id + 100000L, t) } ++
      all.filter(col("doc_id") % 2 === 1).as[(Long, String)].collect().toSeq
    // brute replay: fingerprints via the op's own kernel, cumulative
    // index, dup iff >= minShared hashes shared with ONE indexed doc
    val fps = dedup.Winnow.fingerprintsOf(
        (b1 ++ b2).toDF("doc_id", "text"))
      .select("doc_id", "h").distinct().collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(1)).toSet }
    def dupAgainst(id: Long, index: Seq[Long]): Boolean =
      index.exists(j =>
        (fps.getOrElse(id, Set.empty) & fps.getOrElse(j, Set.empty)).size
          >= dedup.Winnow.WinnowMinShared)
    val expect1 = b1.map { case (id, _) => id -> false }.toMap // empty index
    val idx1 = b1.map(_._1)
    val expect2 = b2.map { case (id, _) => id -> dupAgainst(id, idx1) }.toMap
    val src = MemoryStream[(Long, String)]
    val q = streaming.Streaming.winnowStreamIndexed(
      src.toDF().toDF("doc_id", "text"),
      s"$base/index", s"$base/verdicts", s"$base/ckpt")
    try {
      src.addData(b1); q.processAllAvailable()
      src.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val verdicts = spark.read.parquet(s"$base/verdicts").collect()
      .map(r => (r.getLong(2), r.getLong(0)) -> r.getBoolean(1)).toMap
    assert(verdicts.size == b1.size + b2.size)
    b1.foreach { case (id, _) =>
      assert(verdicts((0L, id)) == expect1(id), s"batch1 doc $id") }
    b2.foreach { case (id, _) =>
      assert(verdicts((1L, id)) == expect2(id), s"batch2 doc $id") }
    // the copies of fingerprint-bearing batch-1 docs MUST be caught
    val caught = b1.filter(x => fps.getOrElse(x._1, Set.empty).size >=
      dedup.Winnow.WinnowMinShared)
    assert(caught.nonEmpty)
    caught.foreach { case (id, _) =>
      assert(verdicts((1L, id + 100000L)), s"copy of $id escaped") }
  }

  // ---- cluster_silhouette ------------------------------------------------

  test("cluster_silhouette = brute centroid-silhouette replay; s in [0,1]") {
    val emb = Tables.embeddings(spark, sf)
    val cents = ann.Ivf.trainCentroids(emb).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    val vecs = emb.collect().map { r =>
      val e = r.getSeq[Float](1).map(_.toDouble).toArray
      (r.getLong(0), e, math.sqrt(e.map(x => x * x).sum))
    }
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    val micro = scala.collection.mutable.Map[Long, (Long, Long)]()
    vecs.foreach { case (_, e, n) =>
      val scored = cents.map { case (cid, ce, cn) =>
        (dot(e, ce) / (n * cn), cid)
      }.sortBy { case (c, cid) => (-c, cid) }
      val (cos1, own) = scored(0); val cos2 = scored(1)._1
      val s = if (cos2 < 1.0) (cos1 - cos2) / (1.0 - cos2) else 0.0
      assert(s >= 0.0 && s <= 1.0 + 1e-9)
      val mu = math.round(s * 1000000)
      val (cnt, sum) = micro.getOrElse(own, (0L, 0L))
      micro(own) = (cnt + 1, sum + mu)
    }
    val got = ann.Silhouette.clusterSilhouette(spark, sf).collect()
    assert(got.length == micro.size)
    assert(got.map(_.getLong(1)).sum == vecs.length.toLong)
    got.foreach { r =>
      val (cnt, sum) = micro(r.getLong(0))
      assert(r.getLong(1) == cnt, s"cid ${r.getLong(0)} count")
      assert(math.abs(r.getDouble(2) - sum.toDouble / cnt / 1e6) < 1e-5,
        s"cid ${r.getLong(0)} mean")
    }
  }

  // ---- holt_winters ------------------------------------------------------

  test("holt_winters = bit-identical JVM fold replay") {
    val (a, b, g, m) = (analytics.Series.HwAlpha, analytics.Series.HwBeta,
      analytics.Series.HwGamma, analytics.Series.HwSeason)
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getLong(2)))
    val got = analytics.Series.holtWinters(spark, sf).collect()
    got.foreach { r =>
      val t = r.getString(0)
      val ds = daily.filter(_._1 == t)
      val d0 = ds.map(_._2).min; val d1 = ds.map(_._2).max
      val byDay = ds.map(x => x._2 -> x._3).toMap
      val vs = (d0 to d1).map(d => byDay.getOrElse(d, 0L).toDouble).toArray
      var l = vs(0); var bb = 0.0; val s = Array.fill(m)(0.0)
      for (j <- 2 to vs.length) {
        val v = vs(j - 1); val i = (j - 1) % m
        val lN = a * (v - s(i)) + (1 - a) * (l + bb)
        val bN = b * (lN - l) + (1 - b) * bb
        s(i) = g * (v - lN) + (1 - g) * s(i)
        l = lN; bb = bN
      }
      val n = vs.length
      assert(r.getLong(1) == n.toLong, s"$t n_days")
      assert(math.abs(r.getDouble(2) - l) < 1e-4 + 1e-9, s"$t level")
      assert(math.abs(r.getDouble(3) - bb) < 1e-4 + 1e-9, s"$t trend")
      assert(math.abs(r.getDouble(4) - (s.max - s.min)) < 1e-4 + 1e-9,
        s"$t amplitude")
      assert(math.abs(r.getDouble(5) - (l + bb + s(n % m))) < 1e-4 + 1e-9,
        s"$t forecast_1")
      assert(math.abs(r.getDouble(6) - (l + 7.0 * bb + s((n + 6) % m)))
        < 1e-4 + 1e-9, s"$t forecast_7")
    }
  }

  // ---- time_split_embargo ----------------------------------------------

  test("time_split_embargo: brute assignment; train never touches b1") {
    val rows = eventRows
    val t0 = rows.map(_._2).min; val t1 = rows.map(_._2).max
    val b1 = t0 + (t1 - t0) * pipeline.Splits.EmbargoTrainPct / 10
    val b2 = t0 + (t1 - t0) * pipeline.Splits.EmbargoValPct / 10
    val e = pipeline.Splits.EmbargoUs
    val census = scala.collection.mutable.Map[String, (Long, Long,
      scala.collection.mutable.Set[Long])]()
    sessionsOf(rows).foreach { s =>
      val sUs = s.map(_._2).min; val eUs = s.map(_._2).max
      val split =
        if (eUs < b1) "train"
        else if (sUs < b1) "purged"
        else if (sUs < b1 + e) "embargo"
        else if (eUs < b2) "val"
        else if (sUs < b2) "purged"
        else if (sUs < b2 + e) "embargo"
        else "test"
      val (ns, ne, us) = census.getOrElse(split,
        (0L, 0L, scala.collection.mutable.Set[Long]()))
      us += s.head._1
      census(split) = (ns + 1, ne + s.length, us)
      if (split == "train") assert(eUs < b1, "train leaks past b1")
    }
    val got = pipeline.Splits.timeSplitEmbargo(spark, sf).collect()
    assert(got.length == census.size)
    got.foreach { r =>
      val (ns, ne, us) = census(r.getString(0))
      assert(r.getLong(1) == ns && r.getLong(2) == ne &&
        r.getLong(3) == us.size.toLong, r.getString(0))
    }
    // partition: every session lands in exactly one bucket
    assert(got.map(_.getLong(2)).sum == rows.length.toLong)
  }
}
