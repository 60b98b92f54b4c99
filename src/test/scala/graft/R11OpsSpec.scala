package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** §2.335–340: record_linkage, blocking_eval, uplift_deciles,
  * jl_projection, token_budget_plan, compaction_plan — each verified
  * against an independent brute-force replay over the collected
  * sf0.001 tables (the oracle gate re-proves them against DuckDB at
  * sf0.01/sf0.1; these specs prove the SEMANTICS, not just parity). */
class R11OpsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (j == 0) i else if (i == 0) j else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** (id, name, nation, seg, band) clean + the in-query dirty twin,
    * re-derived independently in Scala. */
  private lazy val cleanDirty: (Seq[(Long, String, Long, String, Long)],
      Seq[(Long, String, Long, String, Long)]) = {
    val clean = Tables.customer(spark, sf)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .collect().map { r =>
        (r.getLong(0), r.getString(1), r.getInt(2).toLong,
          r.getString(4), math.floor(r.getDouble(3) / 1000.0).toLong)
      }.toSeq
    val dirty = clean.map { case (id, name, nation, seg, band) =>
      val m = id % 5
      val nm = if (m == 0) name.substring(0, name.length - 1)
        else if (m == 3) name.substring(1) else name
      (id, nm,
        if (m == 1) (nation + 7) % 25 else nation,
        if (m == 2) seg.reverse else seg,
        if (m == 3) band + 1 else band)
    }
    (clean, dirty)
  }

  /** Brute candidate pairs: every clean×dirty pair with lev ≤ 1. */
  private lazy val brutePairs: Seq[((Long, String, Long, String, Long),
      (Long, String, Long, String, Long))] = {
    val (clean, dirty) = cleanDirty
    for (a <- clean; b <- dirty if lev(a._2, b._2) <= 1) yield (a, b)
  }

  test("record_linkage: pattern counts + FS weights match a brute lev<=1 replay") {
    val rows = dedup.Linkage.recordLinkage(spark, sf).collect()
    val pats = brutePairs.groupBy { case (a, b) =>
      (if (a._2 == b._2) 1L else 0L,
        if (a._3 == b._3) 1L else 0L,
        if (a._4 == b._4) 1L else 0L,
        if (a._5 == b._5) 1L else 0L)
    }.map { case (k, ps) =>
      k -> (ps.size.toLong, ps.count { case (a, b) => a._1 == b._1 }.toLong)
    }
    assert(rows.length == pats.size)
    val tm = pats.values.map(_._2).sum
    val tu = pats.values.map(p => p._1 - p._2).sum
    // per-field agree-mass among matches / non-matches
    def fieldSums(i: Int): (Long, Long) = {
      val agr = pats.filter { case (k, _) => k.productElement(i)
        .asInstanceOf[Long] == 1L }
      (agr.values.map(_._2).sum, agr.values.map(p => p._1 - p._2).sum)
    }
    rows.foreach { r =>
      val key = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val (np, nm) = pats(key)
      assert(r.getLong(4) == np && r.getLong(5) == nm, s"pattern $key")
      assert(math.abs(r.getDouble(6) - nm.toDouble / np) < 1e-6)
      // FS weight replay, mirroring the op's degenerate-mass NULL gate
      val terms = (0 until 4).map { i =>
        val (ma, ua) = fieldSums(i)
        val flag = key.productElement(i).asInstanceOf[Long]
        if (flag == 1L) {
          if (ma > 0 && ua > 0)
            Some(math.log(ma.toDouble / tm / (ua.toDouble / tu)) /
              math.log(2.0))
          else None
        } else {
          if (tm - ma > 0 && tu - ua > 0)
            Some(math.log((tm - ma).toDouble / tm /
              ((tu - ua).toDouble / tu)) / math.log(2.0))
          else None
        }
      }
      if (terms.forall(_.isDefined)) {
        val w = terms.flatten.sum
        assert(math.abs(r.getDouble(7) - w) < 1e-5,
          s"weight at $key: got ${r.getDouble(7)} want $w")
      } else assert(r.isNullAt(7), s"expected NULL-gated weight at $key")
    }
    // fixture sanity: both matches and non-matches exist
    assert(tm > 0 && tu > 0)
  }

  test("blocking_eval: deletion scheme is complete; equi-block counts match brute") {
    val (clean, dirty) = cleanDirty
    val rows = dedup.Linkage.blockingEval(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val n = clean.size.toLong
    val del = rows("deletion_nbhd")
    // lev<=1 completeness on matches is guaranteed by the fixture
    assert(del.getLong(2) == n && del.getLong(3) == n)
    assert(math.abs(del.getDouble(4) - 1.0) < 1e-9)
    // deletion candidates ⊇ brute lev<=1 pairs (collisions allowed)
    assert(del.getLong(1) >= brutePairs.size)
    val nb = rows("nation_band")
    val cB = clean.groupBy(c => (c._3, c._5)).view.mapValues(_.size).toMap
    val dB = dirty.groupBy(c => (c._3, c._5)).view.mapValues(_.size).toMap
    val cand = cB.map { case (k, c) => c.toLong * dB.getOrElse(k, 0) }.sum
    val covered = clean.zip(dirty).count { case (c, d) =>
      c._3 == d._3 && c._5 == d._5 }
    assert(nb.getLong(1) == cand)
    assert(nb.getLong(2) == covered)
    assert(math.abs(nb.getDouble(5) -
      (1.0 - cand.toDouble / (n.toDouble * n))) < 1e-6)
  }

  test("uplift_deciles matches a brute decile replay") {
    val users = Tables.events(spark, sf)
      .select("user_id", "event_type", "value").collect()
      .groupBy(_.getLong(0)).map { case (uid, es) =>
        (uid,
          es.count(_.getString(1) == "click").toLong,
          es.filter(r => r.getString(1) == "purchase" && !r.isNullAt(2))
            .map(r => math.floor(r.getDouble(2) * 100 + 0.5).toLong).sum)
      }.toSeq
    val nU = users.size.toLong
    val grid = users.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val sortedVals = grid.keys.toSeq.sorted
    val cumBelow = sortedVals.scanLeft(0L)((acc, v) => acc + grid(v))
      .init.zip(sortedVals).map(_.swap).toMap
    def decile(clicks: Long): Long =
      math.min(cumBelow(clicks) * 10 / nU, 9L)
    val cells = users.groupBy(u => decile(u._2))
    val rows = graft.analytics.Uplift.upliftDeciles(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet == cells.keySet)
    var cumCt = 0L; var cumCc = 0L; var cumNt = 0L; var cumNc = 0L
    rows.sortBy(-_.getLong(0)).foreach { r =>
      val d = r.getLong(0)
      val us = cells(d)
      val (t, c) = us.partition(_._1 % 2 == 1)
      assert(r.getLong(1) == t.size && r.getLong(2) == c.size)
      cumNt += t.size; cumNc += c.size
      cumCt += t.map(_._3).sum; cumCc += c.map(_._3).sum
      if (t.nonEmpty && c.nonEmpty) {
        val want = t.map(_._3).sum.toDouble / 100.0 / t.size -
          c.map(_._3).sum.toDouble / 100.0 / c.size
        assert(math.abs(r.getDouble(5) - want) < 1e-5, s"uplift d=$d")
      }
      if (cumNt > 0 && cumNc > 0) {
        val want = cumCt.toDouble / 100.0 / cumNt -
          cumCc.toDouble / 100.0 / cumNc
        assert(math.abs(r.getDouble(6) - want) < 1e-5, s"cum d=$d")
      }
    }
  }

  test("jl_projection matches a brute LCG projection replay") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def proj(x: Array[Float]): Array[Double] =
      Array.tabulate(16) { k =>
        var acc = 0.0
        for (j <- x.indices) {
          val r = ((1103515245L * (k.toLong * x.length + j) + 12345L) %
            2147483648L) % 6L
          val s = if (r == 0L) 1.0 else if (r == 1L) -1.0 else 0.0
          acc += x(j).toDouble * s
        }
        acc
      }
    def d2(a: Array[Double], b: Array[Double]): Double = {
      def dot(u: Array[Double], v: Array[Double]) =
        u.zip(v).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
      dot(a, a) + dot(b, b) - 2.0 * dot(a, b)
    }
    val rows = graft.ann.Jl.jlProjection(spark, sf).collect()
    assert(rows.nonEmpty)
    var ratios = List.empty[Double]
    rows.foreach { r =>
      val a = vecs(r.getLong(0)); val b = vecs(r.getLong(1))
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val o = d2(ad, bd); val p = d2(proj(a), proj(b))
      assert(math.abs(r.getDouble(2) - o) < 1e-4)
      assert(math.abs(r.getDouble(3) - p) < 1e-4)
      if (o > 0) {
        val want = p * 3.0 / 16.0 / o
        assert(math.abs(r.getDouble(4) - want) < 1e-5)
        ratios ::= r.getDouble(4)
      }
    }
    // JL sanity: the mean distortion concentrates near 1
    val mean = ratios.sum / ratios.size
    assert(mean > 0.5 && mean < 2.0, s"mean distortion $mean")
  }

  test("token_budget_plan: exact allocation, isqrt weights, epoch flags") {
    val rows = pipeline.Budget.tokenBudgetPlan(spark, sf).collect()
    val nat = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = nat.values.sum
    val budget = total / 2
    // weights are exact integer sqrts
    rows.foreach { r =>
      val w = r.getLong(2); val t = r.getLong(1)
      assert(w * w <= t && (w + 1) * (w + 1) > t, s"isqrt ${r.getString(0)}")
    }
    // largest-remainder exactness: the allocation spends B to the token
    assert(rows.map(_.getLong(3)).sum == budget)
    // epochs + flag replay
    rows.foreach { r =>
      val alloc = r.getLong(3); val t = r.getLong(1)
      if (t > 0) {
        assert(math.abs(r.getDouble(5) - alloc.toDouble / t) < 1e-3)
        assert(r.getLong(6) == (if (alloc > 4 * t) 1L else 0L))
      }
    }
    // allocation follows the sqrt weights: within ±1 of the real quota
    val wTot = rows.map(_.getLong(2)).sum
    rows.foreach { r =>
      val quota = budget.toDouble * r.getLong(2) / wTot
      assert(math.abs(r.getLong(3) - quota) <= 1.0 + 1e-9)
    }
  }

  test("compaction_plan: next-fit bins are exact and conservative") {
    val files = Tables.events(spark, sf)
      .select(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .groupBy("day", "event_type").count().collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      .sortBy(f => (f._1, f._2))
    val total = files.map(_._3).sum
    val target = (total + 31) / 32
    var cum = 0L
    val bins = files.map { f =>
      val bin = cum / target; cum += f._3; (bin, f)
    }.groupBy(_._1)
    val rows = etl.Compaction.compactionPlan(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet == bins.keySet)
    rows.foreach { r =>
      val fs = bins(r.getLong(0)).map(_._2)
      assert(r.getLong(1) == fs.length)
      assert(r.getLong(2) == fs.map(_._3).sum)
      assert(r.getLong(3) == target)
      assert(r.getLong(5) == (if (fs.map(_._3).sum > target) 1L else 0L))
    }
    // mass conservation + bin-count bound (next-fit: ≤ N+1 bins)
    assert(rows.map(_.getLong(2)).sum == total)
    assert(rows.length <= 33)
  }

  test("t_closeness matches a brute per-group EMD replay") {
    val cust = Tables.customer(spark, sf)
      .select("c_nationkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getInt(0).toLong, r.getString(1),
        math.floor(r.getDouble(2) / 1000.0).toLong))
    val bands = cust.map(_._3).distinct.sorted
    val m = bands.length
    val nAll = cust.length.toLong
    val globCum = bands.map(b => b -> cust.count(_._3 <= b).toLong).toMap
    def emd(group: Seq[Long]): Double = {
      val nG = group.length.toLong
      val num = bands.map { b =>
        val cumG = group.count(_ <= b).toLong
        math.abs(cumG * nAll - globCum(b) * nG).toDouble
      }.sum
      if (m > 1) num / (nG.toDouble * nAll * (m - 1)) else 0.0
    }
    def brute(qi: ((Long, String, Long)) => Any): (Long, Double, Long) = {
      val ts = cust.groupBy(qi).values.toSeq
        .map(g => BigDecimal(emd(g.map(_._3).toSeq))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      (ts.size.toLong, ts.max, ts.count(_ > 0.2).toLong)
    }
    val rows = dq.Privacy.tCloseness(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val (gN, gMax, gAbove) = brute(c => c._1)
    val nat = rows("nation")
    assert(nat.getLong(1) == gN && nat.getLong(2) == m)
    assert(math.abs(nat.getDouble(3) - gMax) < 1e-5)
    assert(nat.getLong(4) == gAbove)
    val (sN, sMax, sAbove) = brute(c => (c._1, c._2))
    val ns = rows("nation_seg")
    assert(ns.getLong(1) == sN)
    assert(math.abs(ns.getDouble(3) - sMax) < 1e-5)
    assert(ns.getLong(4) == sAbove)
    // EMD is a normalized distance: in [0, 1]
    assert(gMax >= 0.0 && gMax <= 1.0 && sMax <= 1.0)
  }

  test("link_scores matches a brute AA/RA replay") {
    val ui = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val deg = ui.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val pairs = ui.groupBy(_._1).toSeq.flatMap { case (u, is) =>
      val items = is.map(_._2).sorted
      for (i <- items.indices; j <- i + 1 until items.length)
        yield ((items(i), items(j)), u)
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def aaE6(u: Long): Long =
      math.floor(1000000.0 / math.log(deg(u).toDouble) + 0.5).toLong
    def raE9(u: Long): Long = (2000000000L + deg(u)) / (2 * deg(u))
    val want = pairs.map { case (p, us) =>
      p -> (us.size.toLong, us.map(aaE6).sum, us.map(raE9).sum)
    }
    val rows = graph.LinkPred.linkScores(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    rows.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      val (cn, aa, ra) = want(key)
      assert(r.getLong(2) == cn, s"cn at $key")
      assert(r.getLong(3) == aa, s"aa at $key")
      assert(math.abs(r.getDouble(4) - aa / 1e6) < 1e-6)
      assert(math.abs(r.getDouble(5) - ra / 1e9) < 1e-6)
    }
    // the top-k really is the top-k by (aa DESC, item_a, item_b)
    val topBrute = want.toSeq
      .map { case ((a, b), (_, aa, _)) => (-aa, a, b) }.sorted
      .take(math.min(100, want.size))
      .map { case (negAa, a, b) => (a, b, -negAa) }
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .toSeq == topBrute)
  }
}
