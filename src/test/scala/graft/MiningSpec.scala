package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analytics.Mining
import graft.pipeline.Splits
import graft.text.Keywords

/** §2.136–140: market_basket, event_transitions, gap_fill,
  * split_leakage, chi2_terms — each checked against an independent
  * brute-force computation over the collected sf0.001 tables. */
class MiningSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  test("market_basket = brute-force pair counts; a-priori prune is lossless") {
    val items = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = items.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val pairCounts = byOrder.values.flatMap { parts =>
      for (i <- parts.indices; j <- i + 1 until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).view.mapValues(_.size)
      .filter(_._2 >= Mining.MinPairCount).toMap
    val itemCounts = items.groupBy(_._2).view.mapValues(_.size).toMap
    val nOrders = byOrder.size.toDouble

    val got = Mining.marketBasket(spark, sf).collect()
    assert(got.length == pairCounts.size,
      "a-priori prune must not lose any qualifying pair")
    got.foreach { r =>
      val (pa, pb, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(pairCounts((pa, pb)) == n, s"count for ($pa,$pb)")
      val lift = (n * nOrders) / (itemCounts(pa).toDouble * itemCounts(pb))
      assert(math.abs(r.getDouble(4) - lift) < 1e-4, s"lift for ($pa,$pb)")
      assert(math.abs(r.getDouble(3) - n / nOrders) < 1e-6)
    }
  }

  test("event_transitions = brute-force lag pairs; rows of P sum to 1") {
    val events = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val expected = events.groupBy(_._1).values.flatMap { es =>
      es.sortBy(e => (e._2.getTime, e._3)).map(_._4).sliding(2).collect {
        case Array(p, n) => (p, n)
      }
    }.groupBy(x => x).view.mapValues(_.size).toMap

    val got = Mining.eventTransitions(spark, sf).collect()
    assert(got.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      == expected)
    got.groupBy(_.getString(0)).values.foreach { rs =>
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-3,
        "per-prev probabilities must sum to 1")
    }
  }

  test("gap_fill: dense spine, gaps carry the last observed value") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(round(sum("value"), 4).as("v")).collect()
      .map(r => ((r.getString(0), r.getTimestamp(1)), r.getDouble(2))).toMap

    val got = Mining.gapFill(spark, sf).collect()
    val dayMs = 86400000L
    got.groupBy(_.getString(0)).foreach { case (et, rs) =>
      val sorted = rs.sortBy(_.getTimestamp(1).getTime)
      // dense: consecutive days, exactly covering [min, max] observed
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getTimestamp(1).getTime - a.getTimestamp(1).getTime == dayMs)
        case _ =>
      }
      val observedDays = daily.keys.filter(_._1 == et).map(_._2).toSeq
      assert(sorted.head.getTimestamp(1) == observedDays.minBy(_.getTime))
      assert(sorted.last.getTimestamp(1) == observedDays.maxBy(_.getTime))
      // fill semantics: observed day = its own value, gap = last observed
      var last = Double.NaN
      sorted.foreach { r =>
        daily.get((et, r.getTimestamp(1))) match {
          case Some(v) =>
            assert(!r.getBoolean(3) && r.getDouble(2) == v); last = v
          case None =>
            assert(r.getBoolean(3) && r.getDouble(2) == last,
              s"gap day must carry the previous value ($et)")
        }
      }
    }
  }

  test("split_leakage = straddling minhash pairs, tags point the right way") {
    val pairs = graft.dedup.Dedup
      .minhashPairs(Tables.documents(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def isVal(id: Long): Boolean = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"sp:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.take(15), 16) % 10 >= Splits.ValFrom
    }
    val expected = pairs.filter { case (a, b) => isVal(a) != isVal(b) }
    val got = Splits.splitLeakage(spark, sf).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet
      == expected.toSet)
    got.foreach { r =>
      assert(isVal(r.getLong(3)) && !isVal(r.getLong(4)),
        "val_doc/train_doc must land on their sides")
      assert(Set(r.getLong(0), r.getLong(1))
        == Set(r.getLong(3), r.getLong(4)))
    }
  }

  test("chi2_terms: top-3 per lang, matches brute-force chi2") {
    val words = Tables.documents(spark, sf)
      .select(col("lang"), explode(graft.text.TextFunctions.tokens(
        lower(col("text")))).as("term")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = words.length.toDouble
    val tl = words.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val tt = words.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val lt = words.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    def chi2(lang: String, term: String): Double = {
      val a = tl.getOrElse((lang, term), 0.0)
      val d = n - tt(term) - lt(lang) + a
      val num = a * d - (tt(term) - a) * (lt(lang) - a)
      n * num * num / (tt(term) * (n - tt(term)) * lt(lang) * (n - lt(lang)))
    }
    val got = Keywords.chi2Terms(spark, sf).collect()
    got.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      assert(rs.map(_.getInt(1)).sorted.sameElements(Array(1, 2, 3)))
      // reported terms are the true argmax set under (chi2 desc, term asc)
      val all = tt.keys.map(t => (t, chi2(lang, t))).toSeq
        .sortBy { case (t, s) => (-s, t) }.take(3).map(_._1)
      assert(rs.sortBy(_.getInt(1)).map(_.getString(2)).sameElements(all),
        s"top-3 for $lang")
    }
    got.foreach { r =>
      assert(math.abs(r.getDouble(4) - chi2(r.getString(0), r.getString(2)))
        < 1e-3)
    }
  }

  test("rfm_segments: cells partition all customers, scores rank correctly") {
    val orders = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderdate", "o_totalprice").collect()
      .map(r => (r.getLong(0),
        r.getAs[java.sql.Timestamp](1).toLocalDateTime.toLocalDate, r.getDouble(2)))
    val maxDate = orders.map(_._2).max
    val per = orders.groupBy(_._1).map { case (_, os) =>
      val recency = java.time.temporal.ChronoUnit.DAYS.between(
        os.map(_._2).max, maxDate).toDouble
      // exact per-row cents, matching the engine's BIGINT carry
      val monetary = os.map(o => math.round(o._3 * 100)).sum / 100.0
      (recency, os.length.toDouble, monetary)
    }.toSeq
    def q(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted; val pos = (s.length - 1) * p
      val lo = s(pos.toInt)
      if (pos.toInt + 1 < s.length)
        lo + (s(pos.toInt + 1) - lo) * (pos - pos.toInt)
      else lo
    }
    def score(x: Double, xs: Seq[Double]): Int =
      1 + Seq(0.25, 0.5, 0.75).count(p => x > q(xs, p))
    val expected = per.groupBy { case (r, f, m) =>
      (5 - score(r, per.map(_._1)), score(f, per.map(_._2)),
        score(m, per.map(_._3)))
    }.view.mapValues(_.size).toMap
    val got = analytics.Rfm.rfmSegments(spark, sf).collect()
    assert(got.map(_.getLong(3)).sum == per.size,
      "segment cells must partition the customer population")
    assert(got.map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
      r.getLong(3)).toMap == expected)
  }

  test("peak_concurrency = brute interval sweep per day") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.sql.Timestamp](2).getTime))
    val gapMs = graft.streaming.Streaming.SessionGapMinutes * 60000L
    val sessions = ev.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._3, e._2))
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
      var start = sorted.head._3; var last = sorted.head._3
      sorted.tail.foreach { e =>
        if (e._3 - last > gapMs) {
          out += ((es.head._1, start, last)); start = e._3
        }
        last = e._3
      }
      out += ((es.head._1, start, last))
      out
    }.toSeq
    def day(t: Long): java.time.LocalDate =
      java.time.Instant.ofEpochMilli(t).atZone(java.time.ZoneOffset.UTC)
        .toLocalDate
    val deltas = sessions.flatMap { case (u, s, e) =>
      Seq((day(s), s, 1, u), (day(s), e, -1, u)) } // both on start day
    val expected = deltas.groupBy(_._1).view.mapValues { ds =>
      var cur = 0L; var peak = Long.MinValue
      ds.sortBy(d => (d._2, -d._3, d._4)).foreach { d =>
        cur += d._3; peak = math.max(peak, cur) }
      (ds.count(_._3 == 1).toLong, peak)
    }.toMap
    val got = Mining.peakConcurrency(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val d = r.getAs[java.sql.Timestamp](0).toLocalDateTime.toLocalDate
      val (ns, pk) = expected(d)
      assert(r.getLong(1) == ns, s"n_sessions $d")
      assert(r.getLong(2) == pk, s"peak $d")
      // sessions are whole within their start day: 1 ≤ peak ≤ starts
      assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(1))
    }
  }

  test("attribution_markov = brute absorbing-chain replay; credits partition") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_type", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getAs[java.sql.Timestamp](2).getTime, r.getLong(3)))
    val journeys = ev.groupBy(_._1).values.map { es =>
      val ordered = es.sortBy(e => (e._3, e._4)).map(_._2).toList
      val i = ordered.indexOf("purchase")
      if (i >= 0) ordered.take(i + 1) else ordered
    }
    val trans = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    journeys.foreach { j =>
      trans((Mining.StartState, j.head)) += 1
      j.sliding(2).foreach {
        case List(a, b) => if (a != "purchase") trans((a, b)) += 1
        case _ =>
      }
      if (j.last != "purchase") trans((j.last, Mining.NullState)) += 1
    }
    val states = (trans.keys.map(_._1) ++ trans.keys.map(_._2))
      .toSeq.distinct.sorted
    val rowTot = trans.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    def solve(removed: Option[String]): Double = {
      var v = states.map(s => s -> (if (s == "purchase") 1.0 else 0.0)).toMap
      for (_ <- 1 to Mining.MarkovIters) {
        v = states.map { s =>
          s -> (if (s == "purchase") 1.0
          else if (s == Mining.NullState) 0.0
          else if (removed.contains(s)) 0.0
          else states.map(d => trans.getOrElse((s, d), 0L).toDouble /
            rowTot.getOrElse(s, 1L) * v(d)).sum)
        }.toMap
      }
      v(Mining.StartState)
    }
    val pFull = solve(None)
    val got = Mining.attributionMarkov(spark, sf).collect()
    val channels = states.filterNot(s =>
      s == Mining.StartState || s == Mining.NullState || s == "purchase")
    assert(got.map(_.getString(0)).sorted.toSeq == channels)
    got.foreach { r =>
      assert(math.abs(r.getDouble(1) - pFull) < 1e-4, "p_conv")
      val ratio = solve(Some(r.getString(0))) / pFull
      assert(math.abs(r.getDouble(2) - ratio) < 1e-4, s"ratio ${r.getString(0)}")
      assert(math.abs(r.getDouble(3) - (1.0 - ratio)) < 1e-4)
      assert(r.getDouble(3) >= -1e-6 && r.getDouble(3) <= 1.0 + 1e-6,
        "removal effect is a probability drop")
    }
    // credit shares partition the total effect
    assert(math.abs(got.map(_.getDouble(4)).sum - 1.0) < 1e-4)
  }

  test("collocations: top-20 by brute-force PMI, count floor respected") {
    val bigrams = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .flatMap(r => r.getString(1).trim.toLowerCase
        .split("\\s+").toSeq.sliding(2).collect {
          case Seq(a, b) => (a, b)
        })
    val cab = bigrams.groupBy(x => x).view.mapValues(_.size).toMap
    val ca = bigrams.groupBy(_._1).view.mapValues(_.size).toMap
    val cb = bigrams.groupBy(_._2).view.mapValues(_.size).toMap
    val n = bigrams.length.toDouble
    def pmi(p: (String, String)): Double =
      (math.log(cab(p)) + math.log(n) - math.log(ca(p._1))
        - math.log(cb(p._2))) / math.log(2.0)
    val expected = cab.keys.toSeq
      .filter(cab(_) >= graft.text.Keywords.CollocMinCount)
      .sortBy(p => (-pmi(p), p._1, p._2)).take(20)
    val got = graft.text.Keywords.collocations(spark, sf).collect()
    assert(got.map(r => (r.getString(1), r.getString(2))).toSeq == expected)
    got.foreach { r =>
      assert(r.getLong(3) >= graft.text.Keywords.CollocMinCount)
      assert(math.abs(r.getDouble(4)
        - pmi((r.getString(1), r.getString(2)))) < 1e-3)
    }
  }

  test("cube_agg: all four grouping combinations, cells match brute force") {
    val li = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_linestatus", "l_quantity").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val got = analytics.Queries.cubeAgg(spark, sf).collect()
    val byFlags = got.groupBy(r => (r.getByte(4).toInt, r.getByte(5).toInt))
    assert(byFlags.keySet == Set((0, 0), (0, 1), (1, 0), (1, 1)))
    // grand total
    val t = byFlags((1, 1)).head
    assert(t.getLong(3) == li.length)
    // detail cells
    val detail = li.groupBy(x => (x._1, x._2)).view.mapValues(_.length).toMap
    assert(byFlags((0, 0)).map(r =>
      (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap == detail)
    // each margin sums to the total
    Seq((0, 1), (1, 0)).foreach { f =>
      assert(byFlags(f).map(_.getLong(3)).sum == li.length)
    }
  }

  test("time_weighted_avg = brute-force interval weighting per user") {
    val events = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    val expected = events.groupBy(_._1).view.mapValues { es =>
      val s = es.sortBy(e => (e._2.getTime, e._3))
      val iv = s.zip(s.tail).map { case (a, b) =>
        (b._2.getTime / 1000 - a._2.getTime / 1000, a._4)
      }
      val span = iv.map(_._1).sum
      (iv.length, span, iv.map { case (w, v) => v * w }.sum / span)
    }.filter(_._2._2 > 0).toMap
    val got = Mining.timeWeightedAvg(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, span, twa) = expected(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == span)
      assert(math.abs(r.getDouble(3) - twa) < 1e-3, s"user ${r.getLong(0)}")
    }
  }

  test("session_paths = brute-force 30-min-gap session path counts") {
    val events = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val gap = graft.streaming.Streaming.SessionGapMinutes * 60L
    val paths = events.groupBy(_._1).values.flatMap { es =>
      val s = es.sortBy(e => (e._2.getTime, e._3))
      val out = scala.collection.mutable.ArrayBuffer[List[String]]()
      var cur = List.empty[String]
      var last = Long.MinValue
      s.foreach { e =>
        val t = e._2.getTime / 1000
        if (cur.nonEmpty && t - last > gap) { out += cur.reverse; cur = Nil }
        cur = e._4 :: cur; last = t
      }
      if (cur.nonEmpty) out += cur.reverse
      out.map(_.mkString(">"))
    }.toSeq
    val counts = paths.groupBy(x => x).view.mapValues(_.size).toMap
    val expected = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = Mining.sessionPaths(spark, sf).collect()
    assert(got.map(r => (r.getString(1), r.getLong(2).toInt)).toSeq == expected)
    assert(got.map(_.getInt(0)).toSeq == (1 to got.length))
  }

  test("label_propagation = brute-force synchronous min-tie-break rounds") {
    val edges = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").as("k")).collect()
      .map(r => (s"u${r.getLong(0)}", s"i${r.getString(1)}")).distinct
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var labels = adj.keys.map(n => n -> n).toMap
    (1 to graph.Graph.LpIters).foreach { _ =>
      labels = adj.map { case (n, nbrs) =>
        val votes = nbrs.map(labels).groupBy(x => x).view.mapValues(_.size)
        val mx = votes.values.max
        n -> votes.filter(_._2 == mx).keys.min
      }
    }
    val expected = labels.values.groupBy(x => x).view.mapValues(_.size).toMap
    val got = graph.Graph.labelPropagation(spark, sf).collect()
    assert(got.map(r => r.getString(0) -> r.getLong(1).toInt).toMap == expected)
  }

  test("attribution = brute-force lookback credit over collected events") {
    val evs = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("tus"),
        col("user_id"), col("event_type"), col("value"),
        get_json_object(col("props"), "$.k").as("item"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4), r.getString(5)))
    val purchases = evs.filter(_._4 == "purchase")
    val clicks = evs.filter(_._4 == "click").groupBy(_._3)
    val lookbackUs = Mining.AttributionLookbackDays * 86400L * 1000000L
    // integer micro-credit replay (the op's round-10 convention: each
    // share is a HALF-UP integer division, sums exact BIGINTs)
    val acc = scala.collection.mutable.Map.empty[String, (Long, Long, Long, Long)]
    purchases.foreach { case (_, pts, user, _, pval, _) =>
      val touches = clicks.getOrElse(user, Array.empty)
        .filter(c => c._2 <= pts && c._2 >= pts - lookbackUs)
      if (touches.nonEmpty) {
        val last = touches.maxBy(c => (c._2, c._1))
        val n = touches.length.toLong
        val pCents = math.round(pval * 100)
        touches.foreach { c =>
          val (t, l, lin, v) = acc.getOrElse(c._6, (0L, 0L, 0L, 0L))
          acc(c._6) = (t + 1, l + (if (c eq last) 1L else 0L),
            lin + (2000000L + n) / (2 * n),
            v + (2 * pCents * 10000L + n) / (2 * n))
        }
      }
    }
    val got = Mining.attribution(spark, sf).collect()
    assert(got.length == acc.size)
    got.foreach { r =>
      val (t, l, lin, v) = acc(r.getString(0))
      assert(r.getLong(1) == t && r.getLong(2) == l, s"counts for ${r.getString(0)}")
      assert(math.abs(r.getDouble(3) - lin / 1e6) < 1e-9, s"linear for ${r.getString(0)}")
      assert(math.abs(r.getDouble(4) - ((v + 50) / 100) / 1e4) < 1e-9,
        s"value for ${r.getString(0)}")
    }
  }

  test("attribution_decay = brute 2^-age credit; credits partition each purchase") {
    val evs = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("tus"),
        col("user_id"), col("event_type"),
        get_json_object(col("props"), "$.k").as("item"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4)))
    val purchases = evs.filter(_._4 == "purchase")
    val clicks = evs.filter(_._4 == "click").filter(_._5 != null).groupBy(_._3)
    val L = Mining.AttributionLookbackDays
    val lookbackUs = L * 86400L * 1000000L
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val acc = scala.collection.mutable.Map.empty[String, (Long, Double)]
    purchases.foreach { case (_, pts, user, _, _) =>
      val touches = clicks.getOrElse(user, Array.empty)
        .filter(c => c._2 <= pts && c._2 >= pts - lookbackUs)
      if (touches.nonEmpty) {
        val ws = touches.map(c => 1L << (L - ((pts - c._2) / 86400000000L).toInt))
        val wTot = ws.sum
        touches.zip(ws).foreach { case (c, w) =>
          val (t, cr) = acc.getOrElse(c._5, (0L, 0.0))
          acc(c._5) = (t + 1, cr + r6(w.toDouble / wTot))
        }
      }
    }
    val got = Mining.attributionDecay(spark, sf).collect()
    assert(got.length == acc.size)
    got.foreach { r =>
      val (t, cr) = acc(r.getString(0))
      assert(r.getLong(1) == t, s"touches ${r.getString(0)}")
      assert(math.abs(r.getDouble(2) - cr) < 1e-5, s"credit ${r.getString(0)}")
    }
    // per-addend-rounded credits sum to ~(number of attributed purchases)
    val nAttr = purchases.count { case (_, pts, user, _, _) =>
      clicks.getOrElse(user, Array.empty)
        .exists(c => c._2 <= pts && c._2 >= pts - lookbackUs)
    }
    assert(math.abs(got.map(_.getDouble(2)).sum - nAttr) < 1e-2)
  }

  test("rolling_active_users = brute-force trailing distinct windows") {
    val ud = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate)).toSet
    val days = ud.map(_._2)
    def active(d: java.time.LocalDate, w: Int): Long = ud.collect {
      case (u, ad) if !ad.isAfter(d) && ad.isAfter(d.minusDays(w)) => u
    }.size.toLong
    val got = Mining.rollingActiveUsers(spark, sf).collect()
    assert(got.length == days.size)
    got.foreach { r =>
      val d = r.getTimestamp(0).toLocalDateTime.toLocalDate
      assert(r.getLong(1) == active(d, 1), s"dau $d")
      assert(r.getLong(2) == active(d, 7), s"wau $d")
      assert(r.getLong(3) == active(d, 28), s"mau $d")
    }
  }

  test("seasonality: cells partition the corpus; index averages to 1") {
    val got = Mining.seasonality(spark, sf).collect()
    val total = Tables.events(spark, sf).count()
    assert(got.map(_.getLong(2)).sum == total, "cells must partition all events")
    got.foreach { r =>
      assert(r.getInt(0) >= 1 && r.getInt(0) <= 7, "dow range")
      assert(r.getInt(1) >= 0 && r.getInt(1) <= 23, "hour range")
      val idx = r.getLong(2).toDouble * 168 / total
      assert(math.abs(r.getDouble(4) - math.rint(idx * 1e4) / 1e4) < 1e-9)
    }
    // Σ_cells index = 168 · Σn / N = 168 exactly, whatever the shape
    assert(math.abs(got.map(_.getDouble(4)).sum - 168.0) < 0.02)
  }

  test("rolling_hll_users: merged day sketches = one-shot trailing sketch; error bounded") {
    import graft.text.TextFunctions.hash64
    val got = Mining.rollingHllUsers(spark, sf).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.nonEmpty)
    // exact per trailing window recomputed brute-force
    val du = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val days = du.map(_._1).distinct
    got.foreach { case (ts, exact, est) =>
      val d = ts.toLocalDateTime.toLocalDate
      val win = du.filter { case (dd, _) =>
        !dd.isAfter(d) && !dd.isBefore(d.minusDays(6))
      }.map(_._2).distinct
      assert(exact === win.size.toLong, s"day $d")
      // HLL at p=12: ~1.6% std error; allow 5%
      assert(math.abs(est - exact) / exact < 0.05, s"day $d est=$est exact=$exact")
    }
    // mergeability: for one day, max-merging the 7 per-day sketches must
    // equal building one sketch over the union of those days' hashes
    val probe = days.sorted.apply(days.size / 2)
    val winHashes = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"),
        hash64(col("user_id").cast("string")).as("h"))
      .filter(col("day").between(
        java.sql.Date.valueOf(probe.minusDays(6)), java.sql.Date.valueOf(probe)))
    val oneShot = winHashes
      .agg(graft.functions.HllSketch.hll_sketch(col("h")))
      .collect().head.getDouble(0)
    val merged = got.find(_._1.toLocalDateTime.toLocalDate == probe).get._3
    assert(math.abs(merged - math.rint(oneShot * 1e4) / 1e4) < 1e-9,
      "merged day sketches must equal the one-shot window sketch")
  }
}
