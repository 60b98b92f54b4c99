package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analytics.Eval

/** §2.203–205: auc_eval, woe_iv, ndcg_eval — each checked against an
  * independent brute-force computation over the collected sf0.001
  * tables (naive all-pairs AUC, hand-binned WOE, per-user ranking
  * replay). */
class EvalSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  private def qualityRows: Array[(Double, Int)] =
    graft.text.TextQueries.qualityFrame(Tables.documents(spark, sf))
      .select((round(col("quality_score") * 10000) / 10000.0).as("s"),
        when(col("lang") === "en", 1).otherwise(0).as("y"))
      .collect().map(r => (r.getDouble(0), r.getInt(1)))

  test("auc_eval = brute-force all-pairs AUC with ties = 1/2") {
    val rows = qualityRows
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    // P(score_pos > score_neg) + P(tie)/2 over every (pos, neg) pair
    var num = 0.0
    for (p <- pos; n <- neg)
      num += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
    val brute = num / (pos.length.toLong * neg.length)

    val got = Eval.aucEval(spark, sf).collect().head
    assert(got.getLong(0) === pos.length.toLong)
    assert(got.getLong(1) === neg.length.toLong)
    assert(math.abs(got.getDouble(2) - brute) < 1e-6, s"auc vs brute $brute")
    assert(math.abs(got.getDouble(3) - (2 * got.getDouble(2) - 1)) < 1e-9)
    // sanity range only — how WELL the score ranks English is a data
    // property, not a metric property (sf0.001 sits near chance)
    assert(got.getDouble(2) > 0.0 && got.getDouble(2) < 1.0)
  }

  test("woe_iv = hand-binned WOE/IV; bins partition the corpus") {
    val docs = graft.text.TextQueries.qualityFrame(Tables.documents(spark, sf))
      .select(
        when(col("lang") === "en", 1).otherwise(0).as("y"),
        round(col("_alpha"), 6).as("alpha"),
        round(col("_stop"), 6).as("stop"),
        round(least(lit(1.0), col("n_tokens").cast("double") / 100.0), 6)
          .as("len"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val nDocs = docs.length.toLong

    val got = Eval.woeIv(spark, sf).collect()
    // every (feature, bin) cell partitions the corpus: 3 × nDocs rows total
    assert(got.map(r => r.getLong(2) + r.getLong(3)).sum === 3 * nDocs)

    for ((feat, fx) <- Seq[(String, ((Int, Double, Double, Double)) => Double)](
        "alpha" -> (_._2), "stop" -> (_._3), "len" -> (_._4))) {
      val binned = docs.groupBy(d => math.min((fx(d) * 10).floor.toInt, 9))
      val np = binned.view.mapValues(_.count(_._1 == 1).toLong).toMap
      val nn = binned.view.mapValues(_.count(_._1 == 0).toLong).toMap
      val totP = np.values.sum.toDouble
      val totN = nn.values.sum.toDouble
      val cells = got.filter(_.getString(0) == feat)
      assert(cells.map(_.getInt(1)).toSet === binned.keySet, s"$feat bins")
      var iv = 0.0
      cells.foreach { r =>
        val b = r.getInt(1)
        assert(r.getLong(2) === np(b), s"$feat bin $b np")
        assert(r.getLong(3) === nn(b), s"$feat bin $b nn")
        val ps = (np(b) + 0.5) / (totP + 5.0)
        val ns = (nn(b) + 0.5) / (totN + 5.0)
        val woe = math.rint(math.log(ps / ns) * 1e6) / 1e6
        assert(math.abs(r.getDouble(4) - woe) < 1e-9, s"$feat bin $b woe")
        iv += math.rint((ps - ns) * woe * 1e6) / 1e6
      }
      cells.foreach(r => assert(math.abs(r.getDouble(6) - iv) < 1e-6))
    }
  }

  test("ndcg_eval = per-user ranking replay; ndcg in (0, 1]") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("bigint").as("item"))
      .filter(col("item").isNotNull)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val views = ev.filter(_._2 == "view").map(t => (t._1, t._3)).distinct
    val pop = ev.filter(_._2 == "click").groupBy(_._3).view
      .mapValues(_.size.toLong).toMap
    val purch = ev.filter(_._2 == "purchase").map(t => (t._1, t._3)).toSet

    def log2(x: Double) = math.log(x) / math.log(2.0)
    val brute = views.groupBy(_._1).flatMap { case (u, vs) =>
      val ranked = vs.map(_._2)
        .sortBy(i => (-pop.getOrElse(i, 0L), i)).take(10)
      val rels = ranked.zipWithIndex.map { case (i, idx) =>
        (idx + 1, if (purch((u, i))) 1 else 0) }
      val nRel = rels.map(_._2).sum
      if (nRel == 0) None
      else {
        val dcg = rels.map { case (rn, rel) =>
          math.rint(rel / log2(rn + 1.0) * 1e6) / 1e6 }.sum
        Some(u -> (nRel.toLong, math.rint(dcg * 1e6) / 1e6,
          Eval.IdcgCum(math.min(nRel, 10) - 1)))
      }
    }

    val got = Eval.ndcgEval(spark, sf).collect()
    assert(got.length === brute.size)
    got.foreach { r =>
      val (u, nRel, dcg, idcg, ndcg) = (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val (bN, bD, bI) = brute(u)
      assert(nRel === bN, s"user $u n_rel")
      assert(math.abs(dcg - bD) < 1e-9, s"user $u dcg")
      assert(math.abs(idcg - bI) < 1e-9, s"user $u idcg")
      assert(ndcg > 0 && ndcg <= 1.0 + 1e-9, s"user $u ndcg range")
      assert(math.abs(ndcg - math.rint(dcg / idcg * 1e6) / 1e6) < 1e-9)
    }
  }

  test("embed_drift = brute per-dim Welch between vec_id halves; top-10 by |t|") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val mid = (vecs.map(_._1).max + 1) / 2
    val dims = vecs.head._2.length
    def welch(dim: Int): (Double, Double, Double) = {
      val old = vecs.filter(_._1 < mid).map(_._2(dim))
      val nw = vecs.filter(_._1 >= mid).map(_._2(dim))
      def mv(xs: Array[Double]) = {
        val m = xs.sum / xs.length
        (m, xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
      }
      val ((m0, v0), (m1, v1)) = (mv(old), mv(nw))
      ((m0 - m1) / math.sqrt(v0 / old.length + v1 / nw.length), m0, m1)
    }
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val all = (0 until dims).map(d => d -> welch(d))
    val top = all.sortBy { case (d, (t, _, _)) => (-math.abs(r4(t)), d) }.take(10)

    val got = ann.Embed.embedDrift(spark, sf).collect()
    assert(got.length === 10)
    got.zip(top).foreach { case (r, (d, (t, m0, m1))) =>
      assert(r.getInt(0) === d, s"dim order: got ${r.getInt(0)} want $d")
      assert(math.abs(r.getDouble(4) - t) < 1e-3, s"dim $d t")
      assert(math.abs(r.getDouble(1) - m0) < 1e-3)
      assert(math.abs(r.getDouble(2) - m1) < 1e-3)
      assert(math.abs(r.getDouble(3) - (m1 - m0)) < 1e-3)
    }
  }

  test("recommender_coverage = brute coverage + Gini over exposure") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("bigint").as("item"))
      .filter(col("item").isNotNull)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val views = ev.filter(_._2 == "view").map(t => (t._1, t._3)).distinct
    val pop = ev.filter(_._2 == "click").groupBy(_._3).view
      .mapValues(_.size.toLong).toMap
    val top10 = views.groupBy(_._1).toSeq.flatMap { case (_, vs) =>
      vs.map(_._2).sortBy(i => (-pop.getOrElse(i, 0L), i)).take(10)
    }
    val catalog = views.map(_._2).distinct.sorted
    val expo = catalog.map(i => i -> top10.count(_ == i).toLong)
    val sorted = expo.sortBy { case (i, x) => (x, i) }.map(_._2)
    val n = sorted.size.toLong
    val total = sorted.sum
    val rankSum = sorted.zipWithIndex.map { case (x, idx) => (idx + 1) * x }.sum
    val gini = 2.0 * rankSum / (n * total) - (n + 1).toDouble / n

    val r = analytics.Eval.recommenderCoverage(spark, sf).collect().head
    assert(r.getLong(0) === n, "n_catalog")
    assert(r.getLong(1) === expo.count(_._2 > 0).toLong, "n_recommended")
    assert(math.abs(r.getDouble(2) - expo.count(_._2 > 0).toDouble / n) < 1e-6)
    assert(math.abs(r.getDouble(3) - gini) < 1e-6, s"gini got ${r.getDouble(3)} want $gini")
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
  }

  test("IdcgCum is the cumulative rounded 1/log2(i+1) series") {
    assert(Eval.IdcgCum.length === 10)
    assert(math.abs(Eval.IdcgCum.head - 1.0) < 1e-9) // 1/log2(2) = 1
    // strictly increasing with decreasing increments (diminishing gains)
    val incs = Eval.IdcgCum.sliding(2).map(p => p(1) - p(0)).toSeq
    assert(incs.forall(_ > 0))
    assert(incs.sliding(2).forall(p => p(1) < p(0) + 1e-9))
  }

  private def scoreRows: Array[(Double, Int)] =
    graft.text.TextQueries.qualityFrame(Tables.documents(spark, sf))
      .select(col("quality_score").as("s"),
        when(col("lang") === "en", 1).otherwise(0).as("y"))
      .collect().map(r => (r.getDouble(0), r.getInt(1)))

  test("pr_curve = brute confusion counts at every threshold; P/R trade off") {
    val rows = scoreRows
    val got = Eval.prCurve(spark, sf).collect()
    assert(got.length == Eval.PrThresholds.length)
    got.foreach { r =>
      val th = r.getDouble(0)
      val tp = rows.count(x => x._1 >= th && x._2 == 1).toLong
      val fp = rows.count(x => x._1 >= th && x._2 == 0).toLong
      val fn = rows.count(x => x._1 < th && x._2 == 1).toLong
      assert(r.getLong(1) == tp && r.getLong(2) == fp && r.getLong(3) == fn,
        s"confusion at θ=$th")
      val prec = if (tp + fp > 0) tp.toDouble / (tp + fp) else 0.0
      val rec = if (tp + fn > 0) tp.toDouble / (tp + fn) else 0.0
      assert(math.abs(r.getDouble(4) - prec) < 1e-4)
      assert(math.abs(r.getDouble(5) - rec) < 1e-4)
    }
    // recall is monotone non-increasing in θ
    val recs = got.sortBy(_.getDouble(0)).map(_.getDouble(5))
    recs.sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-9) }
  }

  test("ece_calibration = brute reliability bins; ece = weighted gap sum") {
    val rows = scoreRows
    val byBin = rows.groupBy(x => math.min((x._1 * 10).toInt, 9))
    val n = rows.length.toDouble
    val got = Eval.eceCalibration(spark, sf).collect()
    assert(got.length == byBin.size)
    var ece = 0.0
    got.sortBy(_.getInt(0)).foreach { r =>
      val xs = byBin(r.getInt(0))
      assert(r.getLong(1) == xs.length.toLong)
      val conf = xs.map(_._1).sum / xs.length
      val acc = xs.count(_._2 == 1).toDouble / xs.length
      assert(math.abs(r.getDouble(2) - conf) < 1e-4, s"conf bin ${r.getInt(0)}")
      assert(math.abs(r.getDouble(3) - acc) < 1e-4)
      assert(math.abs(r.getDouble(4) - math.abs(acc - conf)) < 1e-4)
      ece += xs.length / n * math.abs(acc - conf)
    }
    // the shared ece column equals the weighted gap sum on every row
    got.foreach(r => assert(math.abs(r.getDouble(5) - ece) < 1e-4))
  }

  test("rank_overlap = brute AO@20 of click-rank vs revenue-rank") {
    import graft.analytics.Eval
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("value"),
        get_json_object(col("props"), "$.k").as("item"))
      .filter(col("item").isNotNull).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
    val k = Eval.RoDepth
    val byClicks = ev.filter(_._1 == "click").groupBy(_._3).view
      .mapValues(_.size.toLong).toSeq
      .sortBy { case (i, m) => (-m, i) }.take(k).map(_._1)
    val byRev = ev.filter(_._1 == "purchase").groupBy(_._3).view
      .mapValues(_.map(e => math.round(e._2 * 100)).sum).toSeq
      .sortBy { case (i, m) => (-m, i) }.take(k).map(_._1)
    val got = Eval.rankOverlap(spark, sf).collect().sortBy(_.getInt(0))
    assert(got.length == math.min(k, math.max(byClicks.size, byRev.size))
      || got.length == k)
    var aoSum = 0.0
    got.foreach { r =>
      val d = r.getInt(0)
      val ov = (byClicks.take(d).toSet intersect byRev.take(d).toSet).size
      assert(r.getLong(1) == ov.toLong, s"overlap at depth $d")
      assert(math.abs(r.getDouble(2) - ov.toDouble / d) < 1e-6)
      aoSum += ov.toDouble / d
    }
    got.foreach(r => assert(math.abs(r.getDouble(3) - aoSum / k) < 1e-4))
    // overlap is monotone non-decreasing in depth
    got.map(_.getLong(1)).sliding(2).foreach {
      case Array(a, b) => assert(b >= a); case _ =>
    }
  }

  test("mi_matrix = brute entropies/MI per pair; MI bounds respected") {
    import graft.analytics.Features
    def brute(xy: Seq[(String, String)]): (Double, Double, Double) = {
      val n = xy.length.toDouble
      def h(counts: Iterable[Int]): Double =
        math.log(n) - counts.map(c => c * math.log(c)).sum / n
      val hx = h(xy.groupBy(_._1).values.map(_.size))
      val hy = h(xy.groupBy(_._2).values.map(_.size))
      val hxy = h(xy.groupBy(identity).values.map(_.size))
      (hx, hy, hx + hy - hxy)
    }
    val cust = Tables.customer(spark, sf)
      .select(col("c_nationkey").cast("string"), col("c_mktsegment"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), dayofweek(col("ts")).cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_orderstatus"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val want = Map("nation|segment" -> brute(cust),
      "event_type|dow" -> brute(ev), "priority|status" -> brute(ord))
    val got = graft.analytics.Features.miMatrix(spark, sf).collect()
    assert(got.length == 3)
    got.foreach { r =>
      val (hx, hy, mi) = want(r.getString(0))
      assert(math.abs(r.getDouble(4) - hx) < 1e-4, s"hx ${r.getString(0)}")
      assert(math.abs(r.getDouble(5) - hy) < 1e-4)
      assert(math.abs(r.getDouble(6) - mi) < 1e-4)
      // information-theoretic bounds: 0 ≤ MI ≤ min(H(X), H(Y)); NMI ≤ 1
      assert(r.getDouble(6) >= -1e-6 &&
        r.getDouble(6) <= math.min(hx, hy) + 1e-6)
      assert(r.getDouble(7) >= -1e-6 && r.getDouble(7) <= 1.0 + 1e-6)
    }
  }

  test("ann_recall: hits replayed against a JVM exact top-k") {
    import graft.ann.{Ann, Ivf}
    val emb = Tables.embeddings(spark, sf)
    val vecs = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    val k = 10
    val exact = (0L until 5L).map { q =>
      q -> vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) =>
          (id, math.rint(cos(vecs(q), v) * 1e6) / 1e6) }
        .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1).toSet
    }.toMap
    val ivf = Ivf.ivfTopK(emb).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val got = Ivf.annRecall(spark, sf).collect()
    assert(got.length == 5)
    var totHits = 0L
    got.foreach { r =>
      val q = r.getLong(0)
      val hits = (ivf(q) intersect exact(q)).size.toLong
      assert(r.getLong(1) == hits, s"hits q=$q")
      assert(r.getLong(2) == k.toLong)
      assert(math.abs(r.getDouble(3) - hits.toDouble / k) < 1e-6)
      totHits += hits
    }
    got.foreach(r => assert(
      math.abs(r.getDouble(4) - totHits.toDouble / (5 * k)) < 1e-4))
  }

  test("graph_assortativity = brute Pearson over directed endpoint degrees") {
    val uv = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select(concat(lit("u"), col("user_id")).as("u"),
        concat(lit("i"), get_json_object(col("props"), "$.k")).as("v"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    val dirEdges = uv ++ uv.map(e => (e._2, e._1))
    val deg = dirEdges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val xs = dirEdges.map(e => deg(e._1).toDouble)
    val ys = dirEdges.map(e => deg(e._2).toDouble)
    val m = xs.length.toDouble
    val (mx, my) = (xs.sum / m, ys.sum / m)
    val num = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
    val den = math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum *
      ys.map(b => (b - my) * (b - my)).sum)
    val r = graft.graph.Graph.graphAssortativity(spark, sf).collect().head
    assert(r.getLong(0) == deg.size.toLong, "n_nodes")
    assert(r.getLong(1) == uv.length.toLong, "n_edges")
    assert(math.abs(r.getDouble(2) - xs.sum / m) < 1e-3, "avg_deg")
    assert(math.abs(r.getDouble(3) - num / den) < 1e-4,
      s"r got ${r.getDouble(3)} want ${num / den}")
    assert(r.getDouble(3) >= -1.0 && r.getDouble(3) <= 1.0)
  }
}
