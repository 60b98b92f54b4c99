package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** §2.343–346: shapley_attribution, isotonic_calibration,
  * null_pattern, eb_shrinkage — each verified against an independent
  * brute-force replay over the collected sf0.001 tables (the oracle
  * gate re-proves DuckDB parity; these prove the SEMANTICS). */
class R11bOpsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  test("shapley_attribution equals the 24-permutation definition; " +
       "efficiency holds") {
    val chans = Seq("click", "error", "signup", "view")
    val bit = chans.zipWithIndex.map { case (c, i) => c -> (1 << i) }.toMap
    // journeys: per user, channel mask strictly before the first
    // purchase in (ts, event_id) order; conv = has a purchase
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3)))
    val byUser = ev.groupBy(_._1)
    // .toSeq BEFORE map: mapping a Map to (mask, conv) pairs would
    // collapse equal-mask journeys into one entry
    val journeys = byUser.toSeq.map { case (_, rows) =>
      // full-precision Timestamp ordering (getTime drops micros)
      val fp = rows.filter(_._4 == "purchase")
        .sortBy(r => (r._2.getTime, r._2.getNanos, r._3)).headOption
      val pre = rows.filter(r => r._4 != "purchase" && (fp match {
        case Some(p) =>
          val c = r._2.compareTo(p._2)
          c < 0 || (c == 0 && r._3 < p._3)
        case None => true
      }))
      val mask = pre.map(r => bit.getOrElse(r._4, 0)).fold(0)(_ | _)
      (mask, if (fp.isDefined) 1L else 0L)
    }.toSeq
    val convByMask = journeys.groupBy(_._1)
      .map { case (m, js) => m -> js.map(_._2).sum }
    def v(s: Int): Long = convByMask.collect {
      case (m, c) if (m & s) == m => c }.sum
    // exact Shapley straight from the definition: average marginal
    // contribution over all 4! channel orderings, scaled by 24
    val perms = chans.permutations.toSeq
    val phiX24 = chans.map { ch =>
      ch -> perms.map { perm =>
        val before = perm.takeWhile(_ != ch)
        val s = before.map(bit).fold(0)(_ | _)
        v(s | bit(ch)) - v(s)
      }.sum
    }.toMap
    val rows = analytics.Shapley.shapleyAttribution(spark, sf).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val ch = r.getString(0)
      assert(r.getLong(3) == phiX24(ch),
        s"$ch phi_x24 ${r.getLong(3)} != brute ${phiX24(ch)}")
      val touched = journeys.count { case (m, _) => (m & bit(ch)) != 0 }
      val convP = journeys.collect {
        case (m, c) if (m & bit(ch)) != 0 => c }.sum
      assert(r.getLong(1) == touched && r.getLong(2) == convP)
    }
    // efficiency: Σ φ·24 = 24·(v(full) − v(∅))
    assert(rows.map(_.getLong(3)).sum == 24L * (v(15) - v(0)))
  }

  test("isotonic_calibration equals a sequential PAV run; monotone; " +
       "mean-preserving") {
    val rows = analytics.Calibration.isotonicCalibration(spark, sf)
      .orderBy("bin").collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getLong(1))
    val pos = rows.map(_.getLong(2))
    val iso = rows.map(_.getDouble(4))
    // classic pool-adjacent-violators on (pos/n, weight n)
    case class Block(var s: Double, var w: Double)
    val blocks = scala.collection.mutable.ArrayBuffer.empty[Block]
    for (i <- n.indices) {
      blocks += Block(pos(i).toDouble, n(i).toDouble)
      while (blocks.length > 1 && {
        val a = blocks(blocks.length - 2); val b = blocks.last
        a.s / a.w >= b.s / b.w
      }) {
        val b = blocks.remove(blocks.length - 1)
        blocks.last.s += b.s; blocks.last.w += b.w
      }
    }
    // expand blocks back to per-bin fitted values by weight
    val fitted = scala.collection.mutable.ArrayBuffer.empty[Double]
    var bi = 0
    var left = 0.0
    for (i <- n.indices) {
      if (left <= 0) { left = blocks(bi).w; bi += 1 }
      fitted += blocks(bi - 1).s / blocks(bi - 1).w
      left -= n(i).toDouble
    }
    for (i <- n.indices)
      assert(math.abs(iso(i) - fitted(i)) < 2e-6,
        s"bin $i iso ${iso(i)} != PAV ${fitted(i)}")
    // monotone nondecreasing
    for (i <- 1 until iso.length) assert(iso(i) >= iso(i - 1) - 1e-9)
    // PAV preserves the weighted mean exactly (up to e6 rounding)
    val lhs = n.zip(iso).map { case (w, r) => w * r }.sum
    assert(math.abs(lhs - pos.sum) < n.sum * 2e-6,
      s"weighted mean drift: ${lhs} vs ${pos.sum}")
  }

  test("null_pattern equals a brute per-row replay; planted lift > 1 " +
       "for the co-missing pair") {
    val cust = Tables.customer(spark, sf)
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val flags = cust.map { case (k, seg) =>
      Map(
        "name" -> (k % 7 == 0 && k % 2 == 0),
        "nation" -> (seg == "AUTOMOBILE" && k % 3 == 0),
        "bal" -> (k % 7 == 0),
        "seg" -> (k % 11 == 0))
    }
    val total = flags.length.toLong
    val rows = dq.NullPatterns.nullPattern(spark, sf).collect()
    val (patRows, pairRows) = rows.partition(_.getString(0) == "pattern")
    val brutePat = flags.groupBy { f =>
      val ks = Seq("bal", "name", "nation", "seg").filter(f)
      if (ks.isEmpty) "complete" else ks.mkString(",")
    }.map { case (k, v) => k -> v.length.toLong }
    assert(patRows.length == brutePat.size)
    patRows.foreach { r =>
      assert(r.getLong(2) == brutePat(r.getString(1)), r.getString(1))
      assert(math.abs(r.getDouble(3) -
        brutePat(r.getString(1)).toDouble / total) < 1e-6)
    }
    val cols = Seq("bal", "name", "nation", "seg")
    pairRows.foreach { r =>
      val Array(a, b) = r.getString(1).split("&")
      val nab = flags.count(f => f(a) && f(b)).toLong
      val na = flags.count(_(a)).toLong
      val nb = flags.count(_(b)).toLong
      assert(r.getLong(2) == nab, s"pair ${r.getString(1)}")
      if (na * nb > 0)
        assert(math.abs(r.getDouble(4) -
          nab.toDouble * total / (na * nb)) < 1e-5)
      else assert(r.isNullAt(4))
    }
    assert(pairRows.length == cols.combinations(2).size)
    // the planted mechanism: bal&name co-missing lift ≈ 2 (name only
    // missing when bal is), strictly > 1
    val bn = pairRows.find(_.getString(1) == "bal&name").get
    assert(!bn.isNullAt(4) && bn.getDouble(4) > 1.5,
      s"planted co-missing lift ${bn.getDouble(4)}")
  }

  test("eb_shrinkage equals an exact-arithmetic replay; shrunk rate " +
       "sits between raw and prior; small groups shrink more") {
    val rows = analytics.Shrinkage.ebShrinkage(spark, sf).collect()
    assert(rows.nonEmpty)
    // exact replay of the published identities in BigInt
    val g = rows.map(r => (r.getLong(1), r.getLong(2))) // (n, x)
    val rates = g.map { case (n, x) =>
      (BigInt(2) * x * 1000000 + n) / (BigInt(2) * n) }
    val gN = BigInt(g.length)
    val sumR = rates.sum
    val sumR2 = rates.map(r => r * r).sum
    val m = (2 * sumR + gN) / (2 * gN)
    val varE12 = if (gN > 1)
      (BigInt(2) * (sumR2 - (2 * m * sumR - gN * m * m)) + (gN - 1)) /
        (BigInt(2) * (gN - 1)) else BigInt(0)
    val num = m * (BigInt(1000000) - m) - varE12
    val shrink = varE12 > 0 && num > 0 && gN > 1
    rows.zipWithIndex.foreach { case (r, i) =>
      val (n, x) = g(i)
      assert(math.abs(r.getDouble(3) - rates(i).toDouble / 1e6) < 1e-6)
      if (shrink) {
        val expK = num.toDouble / varE12.toDouble
        assert(math.abs(r.getDouble(4) - expK) < math.abs(expK) * 1e-4 + 1e-6)
        val es = (BigInt(x) * 1000000 * varE12 + m * num).toDouble /
          (BigInt(1000000) * (BigInt(n) * varE12 + num)).toDouble
        assert(math.abs(r.getDouble(6) - es) < 1e-5, s"row $i shrunk")
        // between raw and prior (inclusive, 6dp tolerance)
        val lo = math.min(r.getDouble(3), r.getDouble(5)) - 2e-6
        val hi = math.max(r.getDouble(3), r.getDouble(5)) + 2e-6
        assert(r.getDouble(6) >= lo && r.getDouble(6) <= hi)
      } else {
        assert(r.getDouble(4) == 0.0 && r.getDouble(6) == r.getDouble(3))
      }
    }
  }

  test("sax_motifs equals window counts over the sax_symbols words " +
       "(cross-op replay)") {
    // replay from the SIBLING op's output, not a re-derivation: the
    // symbol chain shares float boundaries with §2.179, so the words
    // are authoritative and the motif arithmetic is what's under test
    val words = analytics.Sax.saxSymbols(spark, sf).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    val w = analytics.SaxMotifs.MotifW
    val brute = words.flatMap { case (et, word) =>
      word.sliding(w).filter(_.length == w).toSeq
        .groupBy(identity).map { case (m, o) => (et, m) -> o.size.toLong }
    }
    val rows = analytics.SaxMotifs.saxMotifs(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getString(0); val motif = r.getString(2)
      val nWin = (words(et).length - w + 1).toLong
      assert(r.getLong(3) == brute((et, motif)), s"$et/$motif")
      assert(r.getLong(3) >= 2)
      assert(math.abs(r.getDouble(4) - brute((et, motif)).toDouble / nWin)
        < 1e-6)
    }
    // ranks are the top of the recurring set: nothing recurring ranks
    // above a reported motif with fewer occurrences
    rows.groupBy(_.getString(0)).foreach { case (et, rs) =>
      val reported = rs.map(_.getString(2)).toSet
      val counts = brute.collect { case ((e, m), c) if e == et => (m, c) }
      val unreported = counts.filter(c => c._2 >= 2 && !reported.contains(c._1))
      val minReported = rs.map(_.getLong(3)).min
      assert(rs.length == math.min(analytics.SaxMotifs.TopM,
        counts.count(_._2 >= 2)))
      unreported.foreach { case (m, c) =>
        assert(c < minReported || (c == minReported &&
          rs.length == analytics.SaxMotifs.TopM), s"$et/$m")
      }
    }
  }

  test("huber_mean equals an exact BigInt IRLS replay; robust to the " +
       "tail by construction") {
    val cust = Tables.customer(spark, sf)
      .select("c_nationkey", "c_acctbal").collect()
      .map(r => (r.getInt(0).toLong,
        BigInt(math.round(r.getDouble(1) * 100)) + analytics.Huber.Shift))
    val rows = analytics.Huber.huberMean(spark, sf).collect()
    val nations = Tables.nation(spark, sf)
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getString(1) -> r.getInt(0).toLong).toMap
    val k1000 = BigInt(analytics.Huber.K1000)
    rows.foreach { r =>
      val nk = nations(r.getString(0))
      val xs = cust.filter(_._1 == nk).map(_._2)
      val n = BigInt(xs.length)
      def halfUp(a: BigInt, b: BigInt): BigInt = (2 * a + b) / (2 * b)
      val m0 = halfUp(xs.sum, n)
      val s = halfUp(xs.map(x => (x - m0).abs).sum, n)
      def irls(m: BigInt): (BigInt, Long) = {
        val ws = xs.map { x =>
          val d = (x - m).abs
          if (d * 1000 <= s * k1000) BigInt(1000000)
          else (2 * s * k1000 * 1000 + d) / (2 * d)
        }
        (halfUp(ws.zip(xs).map { case (w, x) => w * x }.sum, ws.sum),
          ws.count(_ < 1000000).toLong)
      }
      val (m1, _) = irls(m0)
      val (m2, dw2) = irls(m1)
      def cents(v: BigInt): Double =
        (v - analytics.Huber.Shift).toDouble / 100.0
      assert(math.abs(r.getDouble(2) - cents(m0)) < 5e-3, "mean")
      assert(math.abs(r.getDouble(3) - cents(m1)) < 5e-3, "i1")
      assert(math.abs(r.getDouble(4) - cents(m2)) < 5e-3, "i2")
      assert(r.getLong(5) == dw2, "downweighted")
    }
  }

  test("dtw_distance equals a brute full-matrix banded DP; " +
       "dtw <= aligned L1; band 0 = exact aligned L1") {
    import analytics.Dtw
    val ev = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getString(1),
        r.getLong(2)))
    val maxd = ev.map(_._1).max
    val days = (0 until Dtw.T).map(i => maxd.minusDays(Dtw.T - 1L - i))
    val types = ev.map(_._2).distinct.sorted
    val series = types.map { t =>
      val m = ev.filter(_._2 == t).groupBy(_._1)
        .map { case (d, rs) => d -> rs.map(_._3).sum }
      val vs = days.map(d => m.getOrElse(d, 0L))
      val mean = (2 * vs.sum + vs.length) / (2L * vs.length)
      t -> vs.map(_ - mean).toArray
    }.toMap
    def dtw(a: Array[Long], b: Array[Long], band: Int): Long = {
      val n = a.length
      val Inf = 1L << 60
      val dp = Array.fill(n + 1, n + 1)(Inf)
      for (i <- 1 to n; j <- 1 to n if math.abs(i - j) <= band) {
        val best = if (i == 1 && j == 1) 0L
          else math.min(dp(i - 1)(j), math.min(dp(i)(j - 1), dp(i - 1)(j - 1)))
        if (best < Inf) dp(i)(j) = math.abs(a(i - 1) - b(j - 1)) + best
      }
      dp(n)(n)
    }
    val rows = analytics.Dtw.dtwDistance(spark, sf).collect()
    assert(rows.length == types.combinations(2).size)
    rows.foreach { r =>
      val (a, b) = (series(r.getString(0)), series(r.getString(1)))
      val bd = dtw(a, b, Dtw.Band)
      val l1 = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
      assert(r.getLong(3) == bd, s"${r.getString(0)}/${r.getString(1)} dtw")
      assert(r.getLong(4) == l1, "l1_diag = exact aligned L1")
      assert(r.getLong(3) <= r.getLong(4), "banded dtw <= aligned path")
      if (l1 > 0)
        assert(math.abs(r.getDouble(5) - bd.toDouble / l1) < 1e-6)
      else assert(r.isNullAt(5))
    }
  }

  test("burst_detect equals a brute integer-Viterbi replay") {
    import analytics.Burst.BurstFactor
    val ev = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("event_type")).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getString(1)))
    val mind = ev.map(_._1).min
    val maxd = ev.map(_._1).max
    val t = java.time.temporal.ChronoUnit.DAYS.between(mind, maxd) + 1
    val days = (0L until t).map(mind.plusDays)
    def li(x: Long): Long = math.round(1e9 * math.log(x.toDouble))
    val rows = analytics.Burst.burstDetect(spark, sf)
      .orderBy("event_type").collect()
    val types = ev.map(_._2).distinct.sorted
    assert(rows.map(_.getString(0)).toList == types.toList)
    rows.foreach { r =>
      val et = r.getString(0)
      val cm = ev.filter(_._2 == et).groupBy(_._1)
        .map { case (d, rs) => d -> rs.length.toLong }
      val cs = days.map(d => cm.getOrElse(d, 0L))
      val n = cs.sum
      def halfUp(a: Long, b: Long) = (2 * a + b) / (2 * b)
      val c0 = cs.map(c => halfUp(n * 1000000000L, t) - c * li(n) + c * li(t))
      val c1 = cs.map(c => halfUp(BurstFactor * n * 1000000000L, t)
        - c * li(BurstFactor * n) + c * li(t))
      val t01 = li(t)
      // forward path-carrying Viterbi, ties prefer 0/staying
      var v0 = c0.head; var v1 = c1.head + t01
      var p0 = Vector(0); var p1 = Vector(1)
      for (i <- 1 until t.toInt) {
        val (np0, nv0) = if (v0 <= v1) (p0 :+ 0, c0(i) + v0)
          else (p1 :+ 0, c0(i) + v1)
        val (np1, nv1) = if (v1 <= v0 + t01) (p1 :+ 1, c1(i) + v1)
          else (p0 :+ 1, c1(i) + v0 + t01)
        v0 = nv0; v1 = nv1; p0 = np0; p1 = np1
      }
      val st = if (v0 <= v1) p0 else p1
      val burstDays = st.count(_ == 1).toLong
      val nBursts = st.zip(0 +: st).count { case (a, b) => a == 1 && b != 1 }
      val runs = st.mkString.split("0").filter(_.nonEmpty)
      val longest = if (runs.isEmpty) 0L else runs.map(_.length).max.toLong
      val bEvents = st.zip(cs).collect { case (1, c) => c }.sum
      assert(r.getLong(1) == n, "n_events")
      assert(r.getLong(2) == burstDays, s"$et burst_days")
      assert(r.getLong(3) == nBursts.toLong, s"$et n_bursts")
      assert(r.getLong(4) == longest, s"$et longest")
      if (burstDays > 0) {
        val firstIdx = st.indexOf(1); val lastIdx = st.lastIndexOf(1)
        assert(r.getDate(5).toLocalDate == days(firstIdx))
        assert(r.getDate(6).toLocalDate == days(lastIdx))
      } else { assert(r.isNullAt(5) && r.isNullAt(6)) }
      assert(math.abs(r.getDouble(7) - bEvents.toDouble / n) < 1e-6)
    }
  }

  test("mmr_diversify equals a brute greedy MMR replay; rank-1 is the " +
       "most relevant candidate; redundancy never exceeds pool max") {
    import graft.ann.{Ann, Ivf, Mmr}
    val emb = Tables.embeddings(spark, sf)
    val vecs = Ivf.vecsD(emb).collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[Double](1).toArray, r.getDouble(2))).toMap
    def cosE6(a: Long, b: Long): Long = {
      val (ea, na) = vecs(a); val (eb, nb) = vecs(b)
      var s = 0.0; var i = 0
      while (i < ea.length) { s += ea(i) * eb(i); i += 1 }
      math.round(1e6 * s / (na * nb))
    }
    val rows = graft.ann.Mmr.mmrDiversify(spark, sf).collect()
    val nq = 5
    for (q <- 0L until nq.toLong if vecs.contains(q)) {
      val pool = vecs.keys.filter(_ != q).toSeq
        .map(c => c -> cosE6(q, c))
        .sortBy { case (c, rel) => (-rel, c) }.take(Mmr.CandK)
      var sel = Vector.empty[(Long, Long, Long)] // (id, rel, ms)
      for (_ <- 1 to Mmr.K if sel.size < pool.size) {
        val picked = sel.map(_._1).toSet
        val best = pool.filterNot(p => picked(p._1)).map { case (c, rel) =>
          val ms = if (sel.isEmpty) 0L
            else sel.map(s => cosE6(c, s._1)).max
          (c, rel, ms, Mmr.LamX10 * rel - (10 - Mmr.LamX10) * ms)
        }.sortBy { case (c, _, _, sc) => (-sc, c) }.head
        sel :+= ((best._1, best._2, best._3))
      }
      val got = rows.filter(_.getLong(0) == q).sortBy(_.getInt(1))
      assert(got.length == sel.length, s"q=$q count")
      got.zip(sel).zipWithIndex.foreach { case ((r, (id, rel, ms)), i) =>
        assert(r.getLong(2) == id, s"q=$q rk=${i + 1} id")
        assert(math.abs(r.getDouble(3) - rel / 1e6) < 1e-6)
        assert(math.abs(r.getDouble(4) - ms / 1e6) < 1e-6)
      }
      // rank 1 = pure relevance argmax (no redundancy yet)
      assert(got.head.getLong(2) == pool.head._1)
    }
  }

  test("l_diversity equals a brute entropy/recursive replay per config") {
    val cust = Tables.customer(spark, sf)
      .select("c_nationkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getInt(0).toLong, r.getString(1),
        math.floor(r.getDouble(2) / 1000.0).toLong,
        math.floor(r.getDouble(2) / 200.0).toLong))
    def li(x: Long): Long = math.round(1e9 * math.log(x.toDouble))
    def replay(qi: ((Long, String, Long, Long)) => Any):
        (Long, Long, Double, Long, Long) = {
      val groups = cust.groupBy(qi).values.map { rows =>
        val cnts = rows.groupBy(_._4).values.map(_.length.toLong).toSeq
        val ng = cnts.sum
        val ent = li(ng) - (2 * cnts.map(c => c * li(c)).sum + ng) / (2 * ng)
        (cnts.size.toLong, ent, cnts.max, ng)
      }.toSeq
      (groups.size.toLong, groups.map(_._1).min,
        groups.map(_._2).min / 1e9,
        groups.count(_._2 < li(2)).toLong,
        groups.count(g => g._3 > 2 * (g._4 - g._3)).toLong)
    }
    val rows = dq.LDiversity.lDiversity(spark, sf)
      .orderBy("qi_config").collect()
    val coarse = replay(r => (r._1, r._2))
    val fine = replay(r => (r._1, r._2, r._3))
    Seq(("coarse", coarse), ("fine", fine)).zip(rows).foreach {
      case ((name, (ng, minL, minEnt, below, failRec)), r) =>
        assert(r.getString(0) == name)
        assert(r.getLong(1) == ng && r.getLong(2) == minL, name)
        assert(math.abs(r.getDouble(3) - minEnt) < 1e-6, s"$name entropy")
        assert(r.getLong(4) == below && r.getLong(5) == failRec, name)
    }
    // the fine QI refines the coarse one: groups can only multiply and
    // per-group diversity can only drop
    assert(rows(1).getLong(1) >= rows(0).getLong(1))
    assert(rows(1).getDouble(3) <= rows(0).getDouble(3) + 1e-9)
  }

  test("cliffs_delta equals a brute all-pairs count; consistent with " +
       "mann_whitney's direction") {
    val ev = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view"))
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val a = ev.filter(_._1 == "click").map(_._2)
    val b = ev.filter(_._1 == "view").map(_._2)
    val gt = (for (x <- a; y <- b if x > y) yield 1L).sum
    val lt = (for (x <- a; y <- b if x < y) yield 1L).sum
    val r = analytics.Stats.cliffsDelta(spark, sf).collect().head
    assert(r.getLong(0) == a.length.toLong && r.getLong(1) == b.length.toLong)
    assert(r.getLong(2) == gt && r.getLong(3) == lt)
    val d = (gt - lt).toDouble / (a.length.toLong * b.length)
    assert(math.abs(r.getDouble(4) - d) < 1e-6)
    val expMag = if (math.abs(gt - lt) * 1000 <
        a.length.toLong * b.length * 147) "negligible"
      else if (math.abs(gt - lt) * 1000 < a.length.toLong * b.length * 330)
        "small"
      else if (math.abs(gt - lt) * 1000 < a.length.toLong * b.length * 474)
        "medium" else "large"
    assert(r.getString(5) == expMag)
  }
}
