package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ann.Bitext
import graft.dedup.Substring
import graft.graph.Graph

/** §2.129–131: dedup_substring, bitext_mine, item_pagerank — each
  * verified against an independent brute-force formulation over the
  * collected sf0.001 tables. */
class GraphBitextSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def normTokens(text: String): Array[String] =
    text.toLowerCase.replaceAll("[^a-z0-9 ]", "").trim.split("\\s+")

  test("dedup_substring matches brute-force gram counting; planted dups score > 0") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val k = Substring.GramK
    val gramsOf = docs.map { case (id, t) =>
      val toks = normTokens(t)
      id -> (if (toks.length < k) Array.empty[String]
             else toks.sliding(k).map(_.mkString(" ")).toArray)
    }.toMap
    val totals = gramsOf.values.flatten
      .groupBy(identity).view.mapValues(_.size).toMap
    val got = Substring.dedupSubstring(spark, sf).collect()
    assert(got.length == docs.length)
    got.foreach { r =>
      val gs = gramsOf(r.getLong(0))
      val nDup = gs.count(totals(_) >= 2)
      assert(r.getLong(1) == gs.length, s"n_grams doc=${r.getLong(0)}")
      assert(r.getLong(2) == nDup, s"n_dup_grams doc=${r.getLong(0)}")
      val frac = if (gs.isEmpty) 0.0 else round6(nDup.toDouble / gs.length)
      assert(math.abs(r.getDouble(3) - frac) < 1e-9, s"dup_frac doc=${r.getLong(0)}")
    }
    // the corpus plants near/exact duplicate docs — spans must light up
    assert(got.count(_.getLong(2) > 0) > 0, "no duplicated spans found at all")
  }

  test("bitext_mine = brute-force ratio margin; hub normalization differs from raw cosine") {
    val langs = Tables.documents(spark, sf).select("doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    def nrm(a: Array[Float]): Double = math.sqrt(dot(a, a))
    val src = vecs.keys.filter(id => langs.get(id).contains(Bitext.SrcLang)).toSeq.sorted
    val tgt = vecs.keys.filter(id => langs.get(id).contains(Bitext.TgtLang)).toSeq.sorted
    val cos = (for (x <- src; y <- tgt) yield
      (x, y) -> round6(dot(vecs(x), vecs(y)) / (nrm(vecs(x)) * nrm(vecs(y))))).toMap
    def knnAvg(center: Long, others: Seq[Long], get: Long => Double): Double = {
      val top = others.map(o => (get(o), o)).sortBy { case (c, o) => (-c, o) }
        .take(Bitext.KnnK)
      top.map(_._1).sum / top.length
    }
    val kx = src.map(x => x -> knnAvg(x, tgt, y => cos((x, y)))).toMap
    val ky = tgt.map(y => y -> knnAvg(y, src, x => cos((x, y)))).toMap
    val expected = src.flatMap { x =>
      val best = tgt.map { y =>
        (round6(cos((x, y)) / ((kx(x) + ky(y)) / 2.0)), y)
      }.sortBy { case (m, y) => (-m, y) }.head
      if (best._1 >= Bitext.MarginMin) Some((x, best._2, best._1)) else None
    }
    val got = Bitext.bitextMine(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.length == expected.length,
      s"pair count got=${got.length} want=${expected.length}")
    got.zip(expected).foreach { case ((gx, gy, gm), (ex, ey, em)) =>
      assert(gx == ex && gy == ey, s"pair for src=$ex: got tgt=$gy want $ey")
      assert(math.abs(gm - em) < 1e-6, s"margin src=$ex")
    }
    // margin ranking must genuinely differ from raw-cosine ranking for
    // at least one source (otherwise the hub normalization is vacuous)
    val rawBest = src.map { x =>
      x -> tgt.map(y => (cos((x, y)), y)).sortBy { case (c, y) => (-c, y) }.head._2
    }.toMap
    val marginBest = expected.map(e => e._1 -> e._2).toMap
    assert(marginBest.exists { case (x, y) => rawBest(x) != y },
      "margin choice identical to raw cosine for every mined source")
  }

  test("item_pagerank = brute-force damped iteration; mass conserved") {
    val clicks = Tables.events(spark, sf)
      .filter(col("event_type") === "click").select("user_id", "props")
      .collect().map { r =>
        val k = "\"k\":\\s*(\\d+)".r.findFirstMatchIn(r.getString(1)).get.group(1)
        (s"u${r.getLong(0)}", s"i$k")
      }.distinct
    val edges = clicks ++ clicks.map { case (u, v) => (v, u) }
    val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
    val nodes = deg.keys.toSeq.sorted
    val n = nodes.length
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to Graph.Iters) {
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => rank(s) / deg(s) }.sum).toMap
      rank = nodes.map(v =>
        v -> ((1.0 - Graph.Damping) / n
          + Graph.Damping * contrib.getOrElse(v, 0.0))).toMap
    }
    assert(math.abs(rank.values.sum - 1.0) < 1e-9, "rank mass not conserved")
    val got = Graph.itemPagerank(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    val items = nodes.filter(_.startsWith("i"))
    assert(got.length == items.length)
    got.foreach { case (item, r) =>
      assert(math.abs(r - round6(rank(item))) < 1e-6, s"rank of $item")
    }
    // output ordered by rank desc, item asc
    val ord = got.map { case (i, r) => (-r, i) }
    assert(ord.sameElements(ord.sorted), "output not rank-ordered")
  }
}
