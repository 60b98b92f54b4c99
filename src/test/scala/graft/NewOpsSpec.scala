package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analytics.Queries
import graft.dedup.Fuzzy
import graft.text.TextQueries

/** §2.123–127: tfidf, interval_overlap, skyline, anomaly_mad,
  * fuzzy_match — each verified against an independent brute-force
  * formulation over the collected sf0.001 tables, plus plan-shape
  * assertions that the blocking/binning actually removed the
  * quadratic join. */
class NewOpsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("tfidf: ≤3 terms per doc, rank-ordered, score = tf·ln((N+1)/(df+1))") {
    val rows = TextQueries.tfidf(spark, sf).collect()
    val n = Tables.documents(spark, sf).count()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.values.forall(_.length <= 3))
    byDoc.values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length))
      // scores non-increasing down the ranks
      val scores = sorted.map(_.getDouble(5))
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y - 1e-9 })
    }
    rows.foreach { r =>
      val expected = r.getLong(3) * math.log((n + 1.0) / (r.getLong(4) + 1.0))
      assert(math.abs(r.getDouble(5) - expected) < 1e-4,
        s"doc=${r.getLong(0)} term=${r.getString(2)}")
    }
  }

  test("interval_overlap matches the brute-force pair count and plans no cartesian") {
    // null shipdate/quantity rows yield NULL interval bounds and drop
    // out of both the Spark join and the DuckDB oracle — mirror that
    val li = Tables.lineitem(spark, sf).select("l_suppkey", "l_orderkey",
      "l_linenumber", "l_shipdate", "l_quantity")
      .filter(col("l_shipdate").isNotNull && col("l_quantity").isNotNull)
      .collect().map { r =>
      val t0 = r.getAs[java.sql.Timestamp]("l_shipdate")
        .toLocalDateTime.toEpochSecond(java.time.ZoneOffset.UTC)
      (r.getLong(0), (r.getLong(1), r.getInt(2)), t0,
        t0 + r.getDouble(4).toLong * 86400L)
    }
    val brute = li.groupBy(_._1).map { case (supp, xs) =>
      val s = xs.sortBy(_._2)
      // strict id inequality: the dirty driver data has DUPLICATED
      // (orderkey, linenumber) ids, and tuple < pairs none of them
      supp -> s.indices.flatMap(i => (i + 1 until s.length).map(j => (s(i), s(j))))
        .count { case (a, b) => a._2 != b._2 && a._3 <= b._4 && b._3 <= a._4 }
    }.filter(_._2 > 0)
    val got = Queries.intervalOverlap(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(got == brute, s"got ${got.size} suppliers, brute ${brute.size}")
    val plan = Queries.intervalOverlap(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("skyline = exactly the non-dominated orders (NOT-EXISTS brute force)") {
    val os = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderdate", "o_totalprice").collect()
      .map(r => (r.getLong(0),
        r.getAs[java.sql.Timestamp](1).toLocalDateTime.toEpochSecond(java.time.ZoneOffset.UTC),
        r.getDouble(2)))
    val brute = os.filter { a =>
      !os.exists(b => b._2 <= a._2 && b._3 >= a._3 && (b._2 < a._2 || b._3 > a._3))
    }.map(_._1).toSet
    val got = Queries.skyline(spark, sf).collect().map(_.getLong(0)).toSet
    assert(got == brute, s"missing=${brute -- got} extra=${got -- brute}")
  }

  test("anomaly_mad matches brute-force median/MAD/outlier counts") {
    val vals = Tables.events(spark, sf).select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).sorted }
    def median(s: Array[Double]): Double = {
      val lo = s((s.length - 1) / 2); val hi = s(s.length / 2)
      lo + (hi - lo) * 0.5
    }
    val got = Queries.anomalyMad(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet == vals.keySet)
    got.foreach { r =>
      val s = vals(r.getString(0))
      val med = median(s)
      val mad = median(s.map(x => math.abs(x - med)).sorted)
      val out = s.count(x => math.abs(x - med) > 3.0 * 1.4826 * mad)
      assert(math.abs(r.getDouble(1) - med) < 1e-3, s"${r.getString(0)} median")
      assert(math.abs(r.getDouble(2) - mad) < 1e-3, s"${r.getString(0)} mad")
      assert(r.getLong(3) == out && r.getLong(4) == s.length, s"${r.getString(0)} outliers")
    }
  }

  test("heavy_hitters = the exact >=3% terms; SpaceSaving survives eviction pressure") {
    // end-to-end: sketch candidates + exact recount == plain HAVING
    val words = Tables.documents(spark, sf)
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
    val n = words.count()
    val exact = words.groupBy("word").count()
      .filter(col("count") * 100 >= n * 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = TextQueries.heavyHitters(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact, s"got=$got exact=$exact")

    // eviction + merge under pressure: capacity 8 over a 100-term
    // stream where two terms hold 20% each — both MUST survive
    import graft.functions.SpaceSaving.space_saving
    import SparkTestSession.spark.implicits._
    val stream = ((1 to 40).map(i => s"rare_$i") ++
      Seq.fill(30)("hot_a") ++ Seq.fill(30)("hot_b"))
    val cands = stream.toDF("w").repartition(7)
      .agg(space_saving(col("w"), 8)).head().getSeq[String](0)
    assert(cands.size <= 8)
    assert(cands.contains("hot_a") && cands.contains("hot_b"),
      s"heavy terms evicted from $cands")
  }

  test("BoundedLev1 kernel agrees with DP levenshtein, capped at 1") {
    val rng = new scala.util.Random(42)
    def randStr() = (0 until rng.nextInt(8)).map(_ => ('a' + rng.nextInt(3)).toChar).mkString
    val cases = Seq.tabulate(4000)(_ => (randStr(), randStr())) ++
      Seq(("", ""), ("", "a"), ("ab", "ba"), ("aaa", "aa"), ("abc", "abc"))
    import SparkTestSession.spark.implicits._
    val got = cases.toDF("a", "b")
      .select(graft.functions.native.bounded_lev1(col("a"), col("b")))
      .collect().map(_.getInt(0))
    cases.zip(got).foreach { case ((a, b), d) =>
      val exact = lev(a, b)
      val expected = if (exact > 1) -1 else exact
      assert(d == expected, s"'$a' vs '$b': got $d, lev=$exact")
    }
  }

  test("fuzzy_match finds exactly the lev≤1 name pairs via the deletion index") {
    val names = Tables.customer(spark, sf).select("c_custkey", "c_name")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val brute = (for {
      (ia, na) <- names; (ib, nb) <- names
      if ia < ib && lev(na, nb) <= 1
    } yield (ia, ib)).toSet
    val df = Fuzzy.fuzzyMatch(spark, sf)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, s"missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
    assert(df.collect().forall(_.getInt(4) <= 1))
  }

  test("data_skew_report: profiles match brute-force key counts") {
    val got = graft.dq.SkewReport.skewReport(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(6))).toMap
    assert(got.size == 7, "one row per profiled key")
    // brute-force one numeric and one categorical profile
    def brute(df: org.apache.spark.sql.DataFrame, key: String) = {
      val counts = df.select(key).collect().map(_.get(0))
        .groupBy(identity).view.mapValues(_.size.toLong).values.toSeq
      val avg = counts.sum.toDouble / counts.size
      (counts.size.toLong, counts.max, math.rint(avg * 1e4) / 1e4,
        math.rint(counts.max / avg * 1e4) / 1e4)
    }
    assert(got(("events", "user_id")) == brute(Tables.events(spark, sf), "user_id"))
    assert(got(("documents", "lang")) == brute(Tables.documents(spark, sf), "lang"))
    // every ratio is >= 1 by construction (max >= mean)
    got.values.foreach { case (_, _, _, ratio) => assert(ratio >= 1.0) }
  }
}
