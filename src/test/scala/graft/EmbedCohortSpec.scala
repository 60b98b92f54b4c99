package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Brute-force parity + plan checks for §2.168–172 (embed_stats,
  * knn_classify, cohort_matrix, zipf_fit, lang_confusion). */
class EmbedCohortSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  test("embed_stats = per-dimension moments by brute force") {
    val vecs = Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val dims = vecs.head.length
    val got = ann.Embed.embedStats(spark, sf).collect()
    assert(got.length === dims)
    got.foreach { r =>
      val d = r.getInt(0)
      val xs = vecs.map(_(d))
      val mean = xs.sum / xs.length
      assert(r.getLong(1) === xs.length.toLong)
      assert(math.abs(r.getDouble(2) - mean) < 1e-4)
      assert(math.abs(r.getDouble(4) - xs.min) < 1e-4)
      assert(math.abs(r.getDouble(5) - xs.max) < 1e-4)
    }
  }

  test("embed_stats keeps the reduce side constant: 64 groups, partial agg") {
    val plan = ann.Embed.embedStats(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), plan.take(1500))
  }

  test("knn_classify majority vote = brute-force kNN") {
    val rows = Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.rint(d / (math.sqrt(na) * math.sqrt(nb)) * 1e6) / 1e6
    }
    val expected = rows.filter((t => t._1 < 1000 && t._1 % 29 == 0)).map { case (qid, qlab, qv) =>
      val nn = rows.filter(_._1 != qid)
        .map { case (id, lab, v) => (id, lab, cos(qv, v)) }
        .sortBy { case (id, _, c) => (-c, id) }.take(10)
      val votes = nn.groupBy(_._2).view.mapValues(_.size).toSeq
        .sortBy { case (lab, n) => (-n, lab) }
      qid -> (votes.head._1, votes.head._2.toLong, qlab)
    }.toMap
    val got = ann.Embed.knnClassify(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getInt(3))).toMap
    assert(got === expected)
  }

  test("cohort_matrix: offsets non-negative, cohort cells cover every user-week") {
    val m = cohort()
    assert(m.nonEmpty)
    m.foreach { case (_, off, n) => assert(off >= 0 && n > 0) }
    // week 0 of each cohort contains the full cohort population
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)))
    val firstSeen = ev.groupBy(_._1).map { case (u, rs) => (u, rs.map(_._2).min) }
    val cohortSizes = firstSeen.groupBy(_._2).map { case (w, us) => (w, us.size.toLong) }
    val week0 = m.filter(_._2 == 0).map { case (w, _, n) => (w, n) }.toMap
    assert(week0 === cohortSizes)
  }

  private def cohort(): Array[(java.sql.Timestamp, Int, Long)] =
    analytics.Cohorts.cohortMatrix(spark, sf).collect()
      .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2)))

  test("zipf_fit slope is negative and reproduces the closed-form fit") {
    val row = text.TextQueries.zipfFit(spark, sf).collect().head
    val n = row.getLong(0)
    assert(n > 0 && n <= 200)
    assert(row.getDouble(1) < 0.0, "term frequencies must decay with rank")
    // closed form from the brute-force counts
    val freqs = Tables.documents(spark, sf)
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("t"))
      .filter(col("t") =!= "").groupBy("t").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, f) => (-f, t) }.take(200)
    val pts = freqs.zipWithIndex.map { case ((_, f), i) =>
      (math.log(i + 1.0), math.log(f.toDouble)) }
    val (mx, my) = (pts.map(_._1).sum / pts.length, pts.map(_._2).sum / pts.length)
    val slope = (pts.map(p => p._1 * p._2).sum / pts.length - mx * my) /
      (pts.map(p => p._1 * p._1).sum / pts.length - mx * mx)
    assert(math.abs(row.getDouble(1) - math.rint(slope * 1e6) / 1e6) < 1e-5)
  }

  test("lang_confusion recall sums to 100 within each true language") {
    val rows = text.TextQueries.langConfusion(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, cells) =>
      assert(math.abs(cells.map(_._4).sum - 100.0) < 0.01)
    }
    // cells = brute-force regroup of the per-doc langid frame (the
    // synthetic corpus's labels are arbitrary, so no accuracy floor —
    // parity with §2.28's per-doc predictions is the contract)
    assert(rows.map(_._3).sum ===
      Tables.documents(spark, sf).count())
    val perDoc = text.TextQueries.langidFrame(Tables.documents(spark, sf))
      .select("lang", "pred_lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val brute = perDoc.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rows.map(r => (r._1, r._2) -> r._3).toMap === brute)
  }

  test("embed_pca: unit eigenvector of the brute covariance, dominant share") {
    import org.apache.spark.sql.functions.col
    val vecs = Tables.embeddings(spark, sf).select(col("embedding"))
      .collect()
      .map(_.getSeq[Float](0).map(x =>
        math.round(x.toDouble * 1e6).toDouble).toArray)
    val n = vecs.length
    val dim = vecs.head.length
    val s = Array.tabulate(dim)(j => vecs.map(_(j)).sum)
    val c = Array.tabulate(dim, dim) { (j, k) =>
      n.toDouble * vecs.map(v => v(j) * v(k)).sum - s(j) * s(k)
    }
    val got = graft.ann.Embed.embedPca(spark, sf).collect()
      .sortBy(_.getInt(0))
    assert(got.length == dim)
    val v = got.map(_.getDouble(1))
    // unit norm (up to the 6 dp display rounding)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-3)
    // Rayleigh quotient + eigen-residual: after 20 power iterations the
    // loading vector must be an (approximate) eigenvector of C
    val w = Array.tabulate(dim)(j =>
      (0 until dim).map(k => c(j)(k) * v(k)).sum)
    val lambda = (0 until dim).map(j => v(j) * w(j)).sum
    val residual = math.sqrt((0 until dim)
      .map(j => math.pow(w(j) - lambda * v(j), 2)).sum)
    assert(residual < 0.05 * math.abs(lambda),
      s"eigen residual ${residual / lambda}")
    // top eigenvalue dominates every coordinate direction
    assert(lambda >= (0 until dim).map(j => c(j)(j)).max * (1 - 1e-9))
    // explained share replayed from the brute covariance
    val share = got.head.getDouble(2)
    val trace = (0 until dim).map(j => c(j)(j)).sum
    assert(math.abs(share - lambda / trace) < 1e-3,
      s"share $share vs ${lambda / trace}")
    assert(share > 0.0 && share <= 1.0)
    // sign canonicalization: the largest-|loading| dim is positive
    val jmax = (0 until dim).minBy(j => (-math.abs(v(j)), j))
    assert(v(jmax) > 0.0)
  }
}
