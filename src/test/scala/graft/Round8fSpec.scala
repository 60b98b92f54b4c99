package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Brute-force replays for the round-8 sixth-push operators:
  * slice_auc, strata_adjust, spearman_corr.
  */
class Round8fSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def aucOf(sy: Seq[(Double, Long)]): Option[Double] = {
    val np = sy.count(_._2 == 1L).toLong
    val nn = sy.size - np
    if (np == 0 || nn == 0) return None
    // average ranks over the sorted-by-score sequence
    val sorted = sy.sortBy(_._1)
    var rPos = 0.0
    var i = 0
    while (i < sorted.size) {
      var j = i
      while (j < sorted.size && sorted(j)._1 == sorted(i)._1) j += 1
      val avg = (i + 1 + j).toDouble / 2.0
      (i until j).foreach(k => if (sorted(k)._2 == 1L) rPos += avg)
      i = j
    }
    Some((rPos - np.toDouble * (np + 1) / 2.0) / (np.toDouble * nn))
  }

  test("slice_auc = brute rank-sum AUC per slice and pooled") {
    val sf = SparkTestSession.sf
    val rows = graft.text.TextQueries
      .qualityFrame(Tables.documents(spark, sf))
      .select((round(col("quality_score") * 10000) / 10000.0).as("s"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"), col("source"))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getString(2)))
    val bySlice = rows.groupBy(_._3).view
      .mapValues(_.map(t => (t._1, t._2)).toSeq).toMap +
      ("ALL" -> rows.map(t => (t._1, t._2)).toSeq)
    val got = graft.analytics.Eval.sliceAuc(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq == bySlice.keys.toSeq.sorted)
    got.foreach { r =>
      val sy = bySlice(r.getString(0))
      assert(r.getLong(1) == sy.count(_._2 == 1L).toLong)
      assert(r.getLong(2) == sy.count(_._2 == 0L).toLong)
      aucOf(sy) match {
        case None      => assert(r.isNullAt(3))
        case Some(auc) => assert(math.abs(r.getDouble(3) - auc) < 1e-5,
          s"auc ${r.getString(0)}")
      }
    }
  }

  test("strata_adjust = brute stratified replay; weights conserve") {
    val sf = SparkTestSession.sf
    val users = Tables.events(spark, sf).groupBy("user_id").agg(
      sum(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("clicks"),
      sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("errs"),
      sum(when(col("event_type") === "purchase",
        expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L))
        .as("cents"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = users.length.toLong
    // median error count: smallest value whose cum count doubles >= n
    val errSorted = users.map(_._2).sorted
    val med = errSorted((((n + 1) / 2) - 1).toInt) // lower median
    // decile by clicks-value group's first rank
    val byClicks = users.groupBy(_._1).toSeq.sortBy(_._1)
    var cum = 0L
    val strata = byClicks.map { case (c, us) =>
      val s = math.min(9L, cum * 10 / n); cum += us.length; (c, s)
    }.toMap
    val cells = users.groupBy(u => strata(u._1)).view.mapValues { us =>
      val t = us.filter(_._2 > med)
      val c = us.filter(_._2 <= med)
      (t.length.toLong, c.length.toLong,
        t.map(_._3).sum, c.map(_._3).sum)
    }.toMap
    val got = graft.analytics.Stats.strataAdjust(spark, sf).collect()
    var nValid = 0L
    cells.foreach { case (_, (nt, nc, _, _)) =>
      if (nt > 0 && nc > 0) nValid += nt + nc }
    got.foreach { r =>
      val (nt, nc, ct, cc) = cells(r.getLong(0))
      assert(r.getLong(1) == nt && r.getLong(2) == nc, s"arms ${r.getLong(0)}")
      if (nt > 0) assert(math.abs(r.getDouble(3) - ct.toDouble / 100 / nt) < 1e-5)
      if (nc > 0) assert(math.abs(r.getDouble(4) - cc.toDouble / 100 / nc) < 1e-5)
    }
    val totT = cells.values.map(_._1).sum
    val totC = cells.values.map(_._2).sum
    val naive = cells.values.map(_._3).sum.toDouble / 100 / totT -
      cells.values.map(_._4).sum.toDouble / 100 / totC
    assert(math.abs(got(0).getDouble(6) - naive) < 1e-5, "naive")
    val adj = cells.values.collect { case (nt, nc, ct, cc) if nt > 0 && nc > 0 =>
      (nt + nc).toDouble / nValid * (ct.toDouble / 100 / nt - cc.toDouble / 100 / nc)
    }.sum
    assert(math.abs(got(0).getDouble(7) - adj) < 1e-4, "adjusted")
    assert(got(0).getLong(8) ==
      cells.values.count(c => c._1 > 0 && c._2 > 0).toLong)
  }

  test("spearman_corr = brute average-rank replay; |rho| <= 1") {
    val sf = SparkTestSession.sf
    val items = Tables.events(spark, sf)
      .select(get_json_object(col("props"), "$.k").cast("bigint").as("item"),
        col("event_type"), col("value"))
      .filter(col("item").isNotNull)
      .groupBy("item").agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase",
          expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L)).as("y"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    def avgRanks(vs: Array[Long]): Array[Double] = {
      val sorted = vs.zipWithIndex.sortBy(_._1)
      val out = new Array[Double](vs.length)
      var i = 0
      while (i < sorted.length) {
        var j = i
        while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
        val avg = (i + 1 + j).toDouble / 2.0
        (i until j).foreach(k => out(sorted(k)._2) = avg)
        i = j
      }
      out
    }
    def pearson(u: Array[Double], v: Array[Double]): Double = {
      val n = u.length
      val (su, sv) = (u.sum, v.sum)
      val su2 = u.map(a => a * a).sum
      val sv2 = v.map(a => a * a).sum
      val suv = u.zip(v).map { case (a, b) => a * b }.sum
      (n * suv - su * sv) /
        math.sqrt((n * su2 - su * su) * (n * sv2 - sv * sv))
    }
    val xs = items.map(_._1)
    val ys = items.map(_._2)
    val rho = pearson(avgRanks(xs), avgRanks(ys))
    val r = pearson(xs.map(_.toDouble), ys.map(_.toDouble))
    val got = graft.analytics.Stats.spearmanCorr(spark, sf).collect()(0)
    assert(got.getLong(0) == items.length.toLong)
    assert(math.abs(got.getDouble(1) - rho) < 1e-5, "spearman")
    assert(math.abs(got.getDouble(2) - r) < 1e-5, "pearson")
    assert(math.abs(got.getDouble(1)) <= 1.0 + 1e-9)
    assert(math.abs(got.getDouble(2)) <= 1.0 + 1e-9)
  }
}
