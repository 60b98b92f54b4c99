package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Brute-force replays for the round-8 third-push operators:
  * cuped_adjust, lift_table, graph_clustering, bloom_plan,
  * partition_plan.
  */
class Round8cSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("cuped_adjust = brute per-user CUPED replay; identities hold") {
    val sf = SparkTestSession.sf
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getLong(2)))
    val d0 = ev.map(_._2).min
    val half = (ev.map(_._2).max - d0) / 2 // floor: both positive
    val users = ev.groupBy(_._1).map { case (u, rows) =>
      val x = rows.filter(r => r._2 - d0 < half).map(_._3).sum
      val y = rows.filter(r => r._2 - d0 >= half).map(_._3).sum
      (u, x, y)
    }.toSeq
    val n = users.size.toLong
    def bi(l: Long) = BigInt(l)
    val sx = users.map(_._2).sum; val sy = users.map(_._3).sum
    val sxx = users.map(u => bi(u._2) * bi(u._2)).sum
    val sxy = users.map(u => bi(u._2) * bi(u._3)).sum
    val cxy = sxy.toDouble - sx.toDouble * sy.toDouble / n
    val cxx = sxx.toDouble - sx.toDouble * sx.toDouble / n
    val theta = cxy / cxx
    val a = users.filter(_._1 % 2 == 0); val b = users.filter(_._1 % 2 != 0)
    def adj(arm: Seq[(Long, Long, Long)]) =
      (arm.map(_._3).sum.toDouble / arm.size -
        theta * (arm.map(_._2).sum.toDouble / arm.size -
          sx.toDouble / n)) / 100.0
    val r = graft.analytics.Stats.cupedAdjust(spark, sf).collect().head
    assert(r.getLong(0) == a.size && r.getLong(1) == b.size)
    assert(math.abs(r.getDouble(4) - theta) < 1e-4, "theta")
    assert(math.abs(r.getDouble(6) - adj(a)) < 1e-4, "adj_mean_a")
    assert(math.abs(r.getDouble(7) - adj(b)) < 1e-4, "adj_mean_b")
    // identities: var_reduction in [0,1); diff_adj = adjA - adjB
    assert(r.getDouble(5) >= 0.0 && r.getDouble(5) < 1.0)
    assert(math.abs(r.getDouble(9) - (r.getDouble(6) - r.getDouble(7)))
      < 2e-6, "diff_adj bridge")
  }

  test("lift_table = brute decile replay; capture ends at 1, lift ~ base") {
    val sf = SparkTestSession.sf
    val cells = graft.text.TextQueries
      .qualityFrame(Tables.documents(spark, sf))
      .select((round(col("quality_score") * 10000) / 10000.0).as("s"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      .groupBy("s").agg(count(lit(1)).as("cn"), sum("y").as("cp"))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
      .sortBy(-_._1)
    val total = cells.map(_._2).sum
    var cum = 0L
    val byDec = cells.map { case (s, cn, cp) =>
      val d = math.min(cum * 10 / total, 9L) + 1; cum += cn; (d, cn, cp)
    }.groupBy(_._1).view.mapValues(g =>
      (g.map(_._2).sum, g.map(_._3).sum)).toMap
    val got = graft.analytics.Eval.liftTable(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSet == byDec.keySet)
    got.foreach { r =>
      val (n, np) = byDec(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == np, s"decile ${r.getLong(0)}")
    }
    val last = got.maxBy(_.getLong(0))
    assert(math.abs(last.getDouble(5) - 1.0) < 1e-9, "cum_capture ends at 1")
    assert(math.abs(last.getDouble(6) - 1.0) < 1e-9, "final cum_lift = 1")
    // response_rate must be non-trivial somewhere (score is informative)
    assert(got.exists(r => r.getDouble(3) > 0.0))
  }

  test("graph_clustering = brute bin replay over triangles(); ranges hold") {
    val sf = SparkTestSession.sf
    val base = graft.graph.Graph.triangles(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2))) // (deg, triangles)
    val byBin = base.groupBy { case (deg, _) =>
      63 - java.lang.Long.numberOfLeadingZeros(deg) // floor(log2(deg))
    }
    val got = graft.graph.Graph.graphClustering(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSet == byBin.keySet.map(_.toLong))
    got.foreach { r =>
      val g = byBin(r.getLong(0).toInt)
      assert(r.getLong(1) == g.length.toLong, "n_nodes")
      assert(r.getLong(2) == g.map { case (d, _) => d * (d - 1) / 2 }.sum,
        "wedges")
      assert(r.getLong(3) == g.map(_._2).sum, "tri_corners")
      val micro = g.map { case (d, t) =>
        if (d >= 2) math.round(2.0 * t / (d * (d - 1)) * 1e6) else 0L
      }.sum
      val mean = BigDecimal(micro.toDouble / g.length / 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(4) - mean) < 1e-9, "mean_local_cc")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0, "transitivity")
    }
  }

  test("bloom_plan = brute ndv replay; sizing arithmetic exact") {
    val sf = SparkTestSession.sf
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_suppkey").collect()
    val nRows = li.length.toLong
    val ndv = Map(
      "l_orderkey" -> li.map(_.getLong(0)).distinct.length.toLong,
      "l_partkey" -> li.map(_.getLong(1)).distinct.length.toLong,
      "l_suppkey" -> li.map(_.getLong(2)).distinct.length.toLong)
    val got = graft.etl.Layout.bloomPlan(spark, sf).collect()
    assert(got.length == 3)
    got.foreach { r =>
      val c = r.getString(0)
      assert(r.getLong(1) == nRows, s"$c n_rows")
      assert(r.getLong(2) == ndv(c), s"$c ndv")
      val bits = math.ceil(ndv(c) * graft.etl.Layout.BloomBitsPerKey).toLong
      assert(r.getLong(3) == bits, s"$c bits")
      assert(r.getLong(4) == (bits + 7) / 8, s"$c bytes")
      assert(r.getLong(5) == 7L, s"$c k")
      val want = if (ndv(c) <= graft.etl.Layout.BloomDictCutoff) "dict"
        else "bloom"
      assert(r.getString(6) == want, s"$c recommend")
    }
  }

  test("prune_stats = brute two-layout packing replay; sorted layout wins") {
    val sf = SparkTestSession.sf
    val docs = Tables.documents(spark, sf)
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def shardsOf(ord: ((String, Long, Long)) => (Long, Long)) =
      docs.groupBy(_._1).values.flatMap { g =>
        var cum = 0L
        g.sortBy(ord).map { d =>
          cum += d._3
          ((d._1, (cum - 1) / graft.etl.Layout.ShardTargetChars), d._3)
        }
      }.groupBy(_._1).values.map(_.map(_._2)).toSeq
    val layouts = Map(
      "natural" -> shardsOf(d => (d._2, 0L)),
      "sorted_chars" -> shardsOf(d => (d._3, d._2)))
    val got = graft.etl.Layout.pruneStats(spark, sf).collect()
    assert(got.length == 2 * graft.etl.Layout.PruneThresholds.size)
    got.foreach { r =>
      val shards = layouts(r.getString(0)); val p = r.getLong(1)
      assert(r.getLong(2) == shards.size.toLong, "shards_total")
      assert(r.getLong(3) == shards.count(_.max < p).toLong, "shards_pruned")
      assert(r.getLong(4) == docs.length.toLong, "rows_total")
      assert(r.getLong(5) ==
        shards.filter(_.max >= p).map(_.size.toLong).sum, "rows_scanned")
      assert(r.getLong(6) == docs.count(_._3 >= p).toLong, "rows_match")
    }
    // the point of the op: range-sorting never scans MORE than natural
    graft.etl.Layout.PruneThresholds.foreach { p =>
      val byLayout = got.filter(_.getLong(1) == p)
        .map(r => r.getString(0) -> r.getLong(5)).toMap
      assert(byLayout("sorted_chars") <= byLayout("natural"), s"p=$p")
    }
  }

  test("heaps_fit = brute checkpoint replay") {
    val sf = SparkTestSession.sf
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val first = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (id, text) =>
      text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).foreach { t =>
        first.get(t) match {
          case Some(v) if v <= id => ()
          case _ => first(t) = math.min(id, first.getOrElse(t, Long.MaxValue))
        }
      }
    }
    val maxdoc = docs.map(_._1).max
    val jmax = 63 - java.lang.Long.numberOfLeadingZeros(maxdoc)
    val pts = (3 to jmax.toInt).map { j =>
      val c = 1L << j
      val n = docs.count(_._1 <= c).toDouble
      val v = first.values.count(_ <= c).toDouble
      (math.log(n), math.log(v))
    }
    val n = pts.size.toDouble
    val slx = pts.map(_._1).sum; val sly = pts.map(_._2).sum
    val slxly = pts.map(p => p._1 * p._2).sum
    val slxlx = pts.map(p => p._1 * p._1).sum
    val beta = (n * slxly - slx * sly) / (n * slxlx - slx * slx)
    val r = graft.text.TextQueries.heapsFit(spark, sf).collect().head
    assert(r.getLong(0) == pts.size.toLong, "n_checkpoints")
    assert(math.abs(r.getDouble(1) - beta) < 1e-4, "beta")
    // vocabulary never shrinks -> slope of the fit is non-negative
    assert(r.getDouble(1) >= 0.0)
  }

  test("conformal_pi = brute split-conformal replay; coverage ~ 0.9") {
    val sf = SparkTestSession.sf
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getLong(0) % 3, math.round(r.getDouble(1)),
        math.round(r.getDouble(2) * 100)))
    val fit = li.filter(_._1 == 0L)
    val nf = fit.length.toDouble
    val sx = fit.map(_._2).sum.toDouble; val sy = fit.map(_._3).sum.toDouble
    val sxy = fit.map(t => BigInt(t._2) * BigInt(t._3)).sum.toDouble
    val sxx = fit.map(t => BigInt(t._2) * BigInt(t._2)).sum.toDouble
    val beta = (nf * sxy - sx * sy) / (nf * sxx - sx * sx)
    val alpha = (sy - beta * sx) / nf
    def resid(t: (Long, Long, Long)) =
      math.round(math.abs(t._3 - (alpha + beta * t._2)) / 100.0)
    val cal = li.filter(_._1 == 1L).map(resid).sorted
    val qRank = ((9 * (cal.length + 1L) + 9) / 10).toInt
    val q90 = cal(qRank - 1)
    val ev = li.filter(_._1 == 2L).map(resid)
    val cov = ev.count(_ <= q90).toDouble / ev.length
    val r = graft.analytics.Stats.conformalPi(spark, sf).collect().head
    assert(r.getLong(0) == fit.length.toLong &&
      r.getLong(1) == cal.length.toLong && r.getLong(2) == ev.length.toLong)
    assert(math.abs(r.getDouble(3) - beta / 100.0) < 1e-4, "beta")
    assert(math.abs(r.getDouble(5) - q90.toDouble) < 1e-6, "q90")
    assert(math.abs(r.getDouble(6) - cov) < 1e-6, "coverage")
    assert(r.getDouble(6) > 0.85 && r.getDouble(6) < 0.95, "~90% coverage")
  }

  test("sequential_test = brute cumulative-look replay; OBF discipline") {
    val sf = SparkTestSession.sf
    val ev = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select(col("user_id"), to_date(col("ts")).as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getLong(2)))
    val d0 = ev.map(_._2).min; val span = ev.map(_._2).max - d0
    val k = graft.analytics.Stats.ObfZ.size
    def look(day: Long) = math.min(k - 1L, (day - d0) * k / (span + 1))
    val got = graft.analytics.Stats.sequentialTest(spark, sf).collect()
    assert(got.length == k)
    got.foreach { r =>
      val lk = r.getLong(0)
      val a = ev.filter(t => t._1 % 2 == 0 && look(t._2) <= lk)
      val b = ev.filter(t => t._1 % 2 != 0 && look(t._2) <= lk)
      assert(r.getLong(1) == a.length.toLong, s"look $lk n_a")
      assert(r.getLong(2) == b.length.toLong, s"look $lk n_b")
      assert(math.abs(r.getDouble(3) -
        a.map(_._3).sum.toDouble / 100.0 / a.length) < 1e-3, s"look $lk mean_a")
      // boundary literal matches the shared grid; crossed is |z|>=bound
      assert(r.getDouble(6) == graft.analytics.Stats.ObfZ(lk.toInt))
      assert(r.getBoolean(7) ==
        (math.abs(r.getDouble(5)) >= r.getDouble(6)), s"look $lk crossed")
    }
    // rejected_by_now is the running OR of crossed
    var any = false
    got.sortBy(_.getLong(0)).foreach { r =>
      any = any || r.getBoolean(7)
      assert(r.getBoolean(8) == any, s"look ${r.getLong(0)} rejected_by_now")
    }
  }

  test("watermark_plan = brute arrival replay; drops decrease in delay") {
    val sf = SparkTestSession.sf
    val ev = Tables.events(spark, sf).select(
      unix_micros(col("ts")).as("tsu"),
      (datediff(to_date(col("ts")),
        lit(java.sql.Date.valueOf("1970-01-01"))).cast("long") * 32L +
        col("user_id") % 32L).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val bmax = ev.groupBy(_._2).view.mapValues(_.map(_._1).max).toMap
    val batches = bmax.keys.toSeq.sorted
    val wm = batches.zipWithIndex.map { case (b, i) =>
      b -> (if (i == 0) None else Some(batches.take(i).map(bmax).max))
    }.toMap
    val lateMin = ev.map { case (tsu, b) =>
      math.max(0L, wm(b).map(_ - tsu).getOrElse(0L)) / 60000000L
    }
    val got = graft.etl.Layout.watermarkPlan(spark, sf).collect()
    assert(got.length == graft.etl.Layout.WatermarkCandidates.size)
    got.foreach { r =>
      val w = r.getLong(0)
      assert(r.getLong(1) == ev.length.toLong, "n_events")
      assert(r.getLong(2) == lateMin.count(_ > w).toLong, s"w=$w dropped")
      assert(r.getLong(3) == lateMin.max, "max_late_min")
    }
    // more tolerance never drops more
    val shares = got.sortBy(_.getLong(0)).map(_.getLong(2))
    assert(shares.zip(shares.tail).forall { case (x, y) => y <= x })
  }

  test("partition_plan = brute candidate replay; verdict logic exact") {
    val sf = SparkTestSession.sf
    def counts(pairs: Seq[String]): (Long, Long, Long, Long) = {
      val g = pairs.groupBy(identity).view.mapValues(_.size.toLong).values
      (g.size.toLong, g.sum, g.max, g.min)
    }
    val docs = Tables.documents(spark, sf).select("source", "lang").collect()
    val evs = Tables.events(spark, sf).select("event_type").collect()
      .map(_.getString(0)).toSeq
    val ords = Tables.orders(spark, sf).select(
      date_format(col("o_orderdate"), "yyyy-MM")).collect()
      .map(_.getString(0)).toSeq
    val want = Map(
      "documents.source" -> counts(docs.map(_.getString(0)).toSeq),
      "documents.lang" -> counts(docs.map(_.getString(1)).toSeq),
      "events.event_type" -> counts(evs),
      "orders.o_month" -> counts(ords))
    val got = graft.etl.Layout.partitionPlan(spark, sf).collect()
    assert(got.length == 4)
    got.foreach { r =>
      val (np, nr, mx, mn) = want(r.getString(0))
      assert(r.getLong(1) == np && r.getLong(2) == nr &&
        r.getLong(3) == mx && r.getLong(4) == mn, r.getString(0))
      val verdict =
        if (np < graft.etl.Layout.PartMinParts) "too_coarse"
        else if (np > graft.etl.Layout.PartMaxParts) "too_fine"
        else if (mx * 2 > nr) "skewed" else "ok"
      assert(r.getString(6) == verdict, s"${r.getString(0)} verdict")
    }
  }
}
