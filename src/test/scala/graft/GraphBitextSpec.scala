package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ann.Bitext
import graft.dedup.Substring
import graft.graph.Graph
import graft.text.TextQueries

/** §2.129–131: dedup_substring, bitext_mine, item_pagerank — each
  * verified against an independent brute-force formulation over the
  * collected sf0.001 tables. */
class GraphBitextSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private val M = 1000000007L

  /** independent replication of the TokenPolyHashes→ShinglePolyHashes
    * chain: normalize, per-token char fold, k-window token-hash fold */
  private def gramHashes(text: String, k: Int): Array[Long] = {
    val toks = text.toLowerCase.replaceAll("[^a-z0-9 ]", "").trim.split("\\s+")
    val th = toks.map(_.foldLeft(0L)((a, c) => (a * 131 + c.toInt) % M))
    if (th.length < k) Array.empty[Long]
    else th.sliding(k).map(_.foldLeft(0L)((a, h) => (a * 131 + h) % M)).toArray
  }

  test("dedup_substring matches brute-force gram counting; planted dups score > 0") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val k = Substring.GramK
    val gramsOf = docs.map { case (id, t) =>
      id -> gramHashes(t, k)
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

  test("bitext margin arithmetic = brute force on a candidate table; hubs demoted") {
    // hand-built score table with a planted hub: tgt 100 is near EVERY
    // src (hubness), tgt 200 is uniquely near src 1 only
    val rows = Seq(
      (1L, 100L, 0.90), (1L, 200L, 0.85), (1L, 300L, 0.20), (1L, 400L, 0.10),
      (2L, 100L, 0.97), (2L, 300L, 0.30), (2L, 400L, 0.15),
      (3L, 100L, 0.98), (3L, 300L, 0.25), (3L, 400L, 0.12))
    import SparkTestSession.spark.implicits._
    val scored = rows.toDF("src_id", "tgt_id", "cos")
    val got = graft.ann.Bitext.mineFromScores(scored).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    // brute force: knn avgs over the same candidate table
    def knnAvg(xs: Seq[(Double, Long)]): Double = {
      val top = xs.sortBy { case (c, o) => (-c, o) }.take(Bitext.KnnK)
      top.map(_._1).sum / top.length
    }
    val kx = rows.groupBy(_._1).view
      .mapValues(g => knnAvg(g.map(r => (r._3, r._2)))).toMap
    val ky = rows.groupBy(_._2).view
      .mapValues(g => knnAvg(g.map(r => (r._3, r._1)))).toMap
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (x, g) =>
      val best = g.map { case (_, y, c) =>
        (round6(c / ((kx(x) + ky(y)) / 2.0)), y, c) }
        .sortBy { case (m, y, _) => (-m, y) }.head
      if (best._1 >= Bitext.MarginMin) Some((x, best._2, best._1)) else None
    }
    assert(got.toSeq == expected.map(e => (e._1, e._2, e._3)),
      s"got=${got.toSeq} want=$expected")
    // the hub (100) must NOT win src 1: margin prefers the exclusive
    // neighbor 200 even though its raw cosine is lower
    assert(got.find(_._1 == 1L).exists(_._2 == 200L),
      "hub normalization failed to demote the hub target")
  }

  test("bitext_mine end-to-end: cosines exact, one best pair per src, margins ≥ θ") {
    val langs = Tables.documents(spark, sf).select("doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    def nrm(a: Array[Float]): Double = math.sqrt(dot(a, a))
    val got = Bitext.bitextMine(spark, sf).collect()
    assert(got.nonEmpty, "no pairs mined at all")
    val srcs = got.map(_.getLong(0))
    assert(srcs.distinct.length == srcs.length, "duplicate src in output")
    got.foreach { r =>
      val (x, y) = (r.getLong(0), r.getLong(1))
      assert(langs(x) == Bitext.SrcLang && langs(y) == Bitext.TgtLang)
      val c = round6(dot(vecs(x), vecs(y)) / (nrm(vecs(x)) * nrm(vecs(y))))
      assert(math.abs(r.getDouble(2) - c) < 1e-9, s"cosine of ($x,$y)")
      assert(r.getDouble(3) >= Bitext.MarginMin, s"margin of ($x,$y)")
    }
  }

  test("dup_spans = brute-force interval union of duplicated gram windows") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val k = Substring.GramK
    val gramsOf = docs.map { case (id, t) =>
      val toks = t.toLowerCase.replaceAll("[^a-z0-9 ]", "").trim.split("\\s+")
      id -> (toks.length, gramHashes(t, k))
    }.toMap
    val totals = gramsOf.values.flatMap(_._2)
      .groupBy(identity).view.mapValues(_.size).toMap
    val got = Substring.dupSpans(spark, sf).collect()
    assert(got.length == docs.length)
    var anySpans = 0
    got.foreach { r =>
      val id = r.getLong(0)
      val (nTok, gs) = gramsOf(id)
      // merge duplicated windows [p, p+k-1] into maximal spans
      val starts = gs.zipWithIndex.collect {
        case (g, p) if totals(g) >= 2 => p }
      var spans = List.empty[(Int, Int)]
      starts.foreach { p =>
        spans match {
          case (s, e) :: rest if p <= e => spans = (s, math.max(e, p + k - 1)) :: rest
          case _ => spans = (p, p + k - 1) :: spans
        }
      }
      val covered = spans.map { case (s, e) => e - s + 1 }.sum
      assert(r.getLong(1) == spans.length, s"n_dup_spans doc=$id")
      assert(r.getLong(2) == covered, s"covered_tokens doc=$id")
      val frac = if (covered == 0) 0.0 else round6(covered.toDouble / nTok)
      assert(math.abs(r.getDouble(3) - frac) < 1e-9, s"coverage_frac doc=$id")
      anySpans += spans.length
    }
    assert(anySpans > 0, "no duplicated spans found anywhere")
  }

  test("mixed_lang = brute-force chunk votes; majority deterministic") {
    val markers = Map(
      "de" -> Set("der", "die", "und", "das", "nicht"),
      "en" -> Set("the", "a", "is", "of", "and"),
      "es" -> Set("el", "la", "de", "y", "que"),
      "fr" -> Set("le", "la", "et", "les", "des"))
    def predOf(toks: Array[String]): String = {
      val s = markers.map { case (l, m) => l -> toks.count(m.contains) }
      val zh = toks.map(_.count(c => c >= '一' && c <= '鿿')).sum
      if (zh > 0) "zh"
      else if (s("de") >= s("en") && s("de") >= s("es") && s("de") >= s("fr")) "de"
      else if (s("en") >= s("es") && s("en") >= s("fr")) "en"
      else if (s("es") >= s("fr")) "es"
      else "fr"
    }
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val got = TextQueries.mixedLang(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.size == docs.length)
    docs.foreach { case (id, lang, text) =>
      val toks = text.trim.toLowerCase.split("\\s+")
      val preds = toks.grouped(TextQueries.LangChunk).map(predOf).toSeq
      val byLang = preds.groupBy(identity).view.mapValues(_.size).toMap
      val major = byLang.toSeq.sortBy { case (l, c) => (-c, l) }.head
      val r = got(id)
      assert(r.getString(1) == lang)
      assert(r.getLong(2) == preds.length, s"n_chunks doc=$id")
      assert(r.getLong(3) == byLang.size, s"n_langs doc=$id")
      assert(r.getString(4) == major._1, s"major_lang doc=$id")
      assert(math.abs(r.getDouble(5) - round6(major._2.toDouble / preds.length)) < 1e-9)
      assert(r.getBoolean(6) == (byLang.size > 1), s"is_mixed doc=$id")
    }
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

  test("graph_triangles = brute-force closed-triple count on the projection") {
    // brute force: item co-click projection with support >= TriMinSupport,
    // then enumerate all vertex triples over the (small) edge set
    val clicks = Tables.events(spark, sf)
      .filter(col("event_type") === "click").select("user_id", "props")
      .collect().map { r =>
        val k = "\"k\":\\s*(\\d+)".r.findFirstMatchIn(r.getString(1)).get.group(1)
        (r.getLong(0), k)
      }.distinct
    val support = clicks.groupBy(_._1).values.flatMap { is =>
      val items = is.map(_._2).distinct.sorted
      for (i <- items.indices; j <- i + 1 until items.length)
        yield (items(i), items(j))
    }.groupBy(identity).view.mapValues(_.size).toMap
    // NB: Map.collect with a Tuple2-valued partial function rebuilds a
    // Map (dropping duplicate first elements) — filter + keySet instead
    val edges = support.filter(_._2 >= Graph.TriMinSupport).keySet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    def adj(a: String, b: String) =
      edges.contains(if (a < b) (a, b) else (b, a))
    val triPerNode = scala.collection.mutable.Map.empty[String, Long]
    for {
      i <- nodes.indices; j <- i + 1 until nodes.length
      if adj(nodes(i), nodes(j))
      k <- j + 1 until nodes.length
      if adj(nodes(i), nodes(k)) && adj(nodes(j), nodes(k))
    } Seq(nodes(i), nodes(j), nodes(k)).foreach(n =>
      triPerNode(n) = triPerNode.getOrElse(n, 0L) + 1)
    val degree = nodes.map(n =>
      n -> edges.count(e => e._1 == n || e._2 == n).toLong).toMap
    val got = Graph.triangles(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length == nodes.length, "one row per projection node")
    got.foreach { case (item, deg, tri) =>
      assert(deg == degree(item), s"degree of $item")
      assert(tri == triPerNode.getOrElse(item, 0L), s"triangles of $item")
    }
    // sanity: the planted projection is dense enough to have triangles
    assert(got.map(_._3).sum > 0, "no triangles found — fixture degenerate")
    // total count: each triangle credited to exactly 3 corners
    assert(got.map(_._3).sum % 3 == 0)
  }

  test("graph_bfs = brute-force multi-source BFS levels") {
    val clicks = Tables.events(spark, sf)
      .filter(col("event_type") === "click").select("user_id", "props")
      .collect().map { r =>
        val k = "\"k\":\\s*(\\d+)".r.findFirstMatchIn(r.getString(1)).get.group(1)
        (s"u${r.getLong(0)}", s"i$k")
      }.distinct
    val edges = clicks ++ clicks.map(e => (e._2, e._1))
    val adjM = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
    val srcs = deg.keys.filter(_.startsWith("i")).toSeq
      .sortBy(k => (-deg(k), k)).take(Graph.BfsSources)
    var dist = srcs.map(_ -> 0L).toMap
    var frontier = srcs.toSet
    for (k <- 1 to Graph.BfsMaxHops) {
      val next = frontier.flatMap(n => adjM.getOrElse(n, Set.empty)) -- dist.keySet
      dist ++= next.map(_ -> k.toLong)
      frontier = next
    }
    val got = Graph.graphBfs(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.toMap == dist, "BFS levels differ from brute force")
    // ordered by (dist, node); and the graph actually has depth
    assert(got.sameElements(got.sortBy(x => (x._2, x._1))), "output order")
    assert(dist.values.exists(_ > 0), "fixture degenerate: no frontier growth")
  }
}
