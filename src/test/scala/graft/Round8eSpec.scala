package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Brute-force replays for the round-8 fifth-push operators:
  * cohens_kappa, brier_decomposition, gini_lorenz, zorder_stats,
  * context_len_sweep.
  */
class Round8eSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def labels(): Array[(Long, Long)] = {
    val sf = SparkTestSession.sf
    graft.text.TextQueries.qualityFrame(Tables.documents(spark, sf))
      .select(
        when(col("quality_score") >= graft.analytics.Eval.KappaScoreGate, 1L)
          .otherwise(0L),
        when(col("n_tokens") >= graft.analytics.Eval.KappaMinTokens &&
          col("_alpha") >= graft.analytics.Eval.KappaMinAlpha, 1L)
          .otherwise(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
  }

  test("cohens_kappa = brute contingency replay; cells conserve") {
    val sf = SparkTestSession.sf
    val ab = labels()
    val n = ab.length.toLong
    val n11 = ab.count(p => p._1 == 1 && p._2 == 1).toLong
    val n10 = ab.count(p => p._1 == 1 && p._2 == 0).toLong
    val n01 = ab.count(p => p._1 == 0 && p._2 == 1).toLong
    val n00 = ab.count(p => p._1 == 0 && p._2 == 0).toLong
    val r = graft.analytics.Eval.cohensKappa(spark, sf).collect()(0)
    assert(r.getLong(0) == n && r.getLong(1) == n11 &&
      r.getLong(2) == n10 && r.getLong(3) == n01 && r.getLong(4) == n00)
    assert(n11 + n10 + n01 + n00 == n)
    val po = (n11 + n00).toDouble / n
    val pe = ((n11 + n10) * (n11 + n01) +
      (n - n11 - n10) * (n - n11 - n01)).toDouble / (n.toDouble * n)
    assert(math.abs(r.getDouble(5) - po) < 1e-6)
    assert(math.abs(r.getDouble(6) - pe) < 1e-6)
    val degenerate = ((n11 + n10) == 0 || (n11 + n10) == n) &&
      ((n11 + n01) == 0 || (n11 + n01) == n)
    if (degenerate) assert(r.isNullAt(7))
    else assert(math.abs(r.getDouble(7) - (po - pe) / (1.0 - pe)) < 1e-5)
  }

  test("brier_decomposition = brute BS; Murphy identity closes via gap") {
    val sf = SparkTestSession.sf
    val sy = graft.text.TextQueries.qualityFrame(Tables.documents(spark, sf))
      .select(round(col("quality_score") * 1000000).cast("long"),
        when(col("lang") === "en", 1L).otherwise(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = sy.length.toLong
    val e2 = sy.map { case (s, y) =>
      val e = s - y * 1000000L; BigInt(e) * BigInt(e) }.sum
    val bs = e2.toDouble / 1e12 / n
    val ybar = sy.map(_._2).sum.toDouble / n
    val r = graft.analytics.Eval.brierDecomposition(spark, sf).collect()(0)
    assert(r.getLong(0) == n)
    assert(math.abs(r.getDouble(2) - bs) < 1e-7, "brier")
    assert(math.abs(r.getDouble(3) - ybar * (1.0 - ybar)) < 1e-7, "unc")
    // the decomposition closes exactly through the reported gap
    val closed = r.getDouble(4) - r.getDouble(5) + r.getDouble(3) +
      r.getDouble(6)
    assert(math.abs(closed - r.getDouble(2)) < 1e-6, "identity")
    // gap is the within-bin variance the binning hides: nonnegative
    // up to addend rounding
    assert(r.getDouble(6) > -1e-6, "gap >= 0")
    assert(math.abs(r.getDouble(7) -
      (1.0 - bs / (ybar * (1.0 - ybar)))) < 1e-4, "skill")
  }

  test("gini_lorenz = brute per-segment replay; Lorenz bounds hold") {
    val sf = SparkTestSession.sf
    val rev = Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
      .join(Tables.customer(spark, sf)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")), "o_custkey")
      .select("c_mktsegment", "cents")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val got = graft.analytics.Mining.giniLorenz(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq == rev.keys.toSeq.sorted)
    got.foreach { r =>
      val xs = rev(r.getString(0))
      val n = xs.length.toLong
      val sx = xs.map(BigInt(_)).sum
      val six = xs.zipWithIndex.map { case (x, i) => BigInt(x) * (i + 1) }.sum
      val gini = 2.0 * six.toDouble / (n.toDouble * sx.toDouble) -
        (n + 1).toDouble / n
      val b50 = xs.take((n / 2).toInt).map(BigInt(_)).sum.toDouble / sx.toDouble
      val t10 = xs.drop((n * 9 / 10).toInt).map(BigInt(_)).sum.toDouble / sx.toDouble
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == sx.toLong)
      assert(math.abs(r.getDouble(3) - gini) < 1e-5, s"gini ${r.getString(0)}")
      assert(math.abs(r.getDouble(4) - b50) < 1e-5, "b50")
      assert(math.abs(r.getDouble(5) - t10) < 1e-5, "t10")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 1.0)
      assert(r.getDouble(4) <= 0.5 + 1e-9, "bottom half holds <= half")
      assert(r.getDouble(5) >= 0.1 - 1e-9, "top decile holds >= 1/10")
    }
  }

  test("zorder_stats = brute shard/footer replay; match invariant") {
    val sf = SparkTestSession.sf
    val rows = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_suppkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val maxo = rows.map(_._1).max
    val maxp = rows.map(_._2).max
    val maxs = rows.map(_._3).max
    def morton(px: Long, py: Long): Long =
      (0 until 16).map { i =>
        ((px >> i) & 1L) << (2 * i + 1) | ((py >> i) & 1L) << (2 * i)
      }.sum
    def shards(layout: String): Map[Long, Array[(Long, Long)]] =
      rows.map { case (o, p, s) =>
        val px = p * 65536L / (maxp + 1)
        val py = s * 65536L / (maxs + 1)
        val sh = layout match {
          case "natural"     => math.min(63L, o * 64L / (maxo + 1))
          case "sorted_part" => px / 1024L
          case "zorder"      => morton(px, py) / 67108864L
        }
        (sh, (p, s))
      }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val boxes = Map("narrow" -> 3L, "wide" -> 5L)
    val got = graft.etl.Layout.zorderStats(spark, sf).collect()
    assert(got.length == 6)
    got.foreach { r =>
      val (layout, box) = (r.getString(0), r.getString(1))
      val hi = boxes(box)
      val (plo, phi) = (maxp * 2 / 10, maxp * hi / 10)
      val (slo, shi) = (maxs * 2 / 10, maxs * hi / 10)
      val byShard = shards(layout)
      def matches(p: Long, s: Long) =
        p > plo && p <= phi && s > slo && s <= shi
      val scanned = byShard.filter { case (_, ps) =>
        ps.map(_._1).max > plo && ps.map(_._1).min <= phi &&
          ps.map(_._2).max > slo && ps.map(_._2).min <= shi
      }
      assert(r.getLong(2) == byShard.size, "shards_total")
      assert(r.getLong(3) == scanned.size, "shards_scanned")
      assert(r.getLong(4) == rows.length.toLong, "rows_total")
      assert(r.getLong(5) == scanned.values.map(_.length.toLong).sum,
        "rows_scanned")
      assert(r.getLong(6) ==
        rows.count(t => matches(t._2, t._3)).toLong, "rows_match")
      assert(r.getLong(5) >= r.getLong(6), "scan superset of match")
    }
    // the same box matches the same rows under every layout
    boxes.keys.foreach { b =>
      assert(got.filter(_.getString(1) == b).map(_.getLong(6)).distinct
        .length == 1)
    }
  }

  test("context_len_sweep = brute replay; monotone in max_len") {
    val sf = SparkTestSession.sf
    val toks = Tables.documents(spark, sf)
      .select(size(split(trim(col("text")), "\\s+")).cast("long"))
      .collect().map(_.getLong(0))
    val tDocs = toks.length.toLong
    val tToks = toks.sum
    val got = graft.text.CorpusOps.contextLenSweep(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSeq ==
      graft.text.CorpusOps.ContextLengths.map(_.toLong))
    got.foreach { r =>
      val l = r.getLong(0)
      val trunc = toks.map(t => math.max(0L, t - l)).sum
      val pad = toks.map(t => l - math.min(t, l)).sum
      assert(r.getLong(1) == toks.count(_ > l).toLong, "docs_truncated")
      // integer HALF-UP grid replay
      assert(r.getDouble(2) ==
        ((trunc * 2000000L + tToks) / (2L * tToks)).toDouble / 1e6, "trunc")
      assert(r.getDouble(3) ==
        ((pad * 2000000L + tDocs * l) / (2L * tDocs * l)).toDouble / 1e6,
        "pad")
      assert(r.getLong(4) == tDocs)
      assert(r.getLong(5) == (tToks + l - 1) / l, "seqs_concat")
      assert(r.getLong(6) == tToks)
    }
    val byL = got.sortBy(_.getLong(0))
    assert(byL.map(_.getDouble(2)).sliding(2).forall(w => w(0) >= w(1) - 1e-9),
      "trunc share non-increasing")
    assert(byL.map(_.getDouble(3)).sliding(2).forall(w => w(0) <= w(1) + 1e-9),
      "pad share non-decreasing")
    assert(byL.map(_.getLong(5)).sliding(2).forall(w => w(0) >= w(1)),
      "seqs_concat non-increasing")
  }
}
