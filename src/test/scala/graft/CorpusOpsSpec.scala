package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** CountMin + corpus-analysis ops (§2.193–196). */
class CorpusOpsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import graft.functions.CountMin
  import graft.text.TextFunctions.hash64

  private def itemCounts: Map[Long, Long] = Tables.events(spark, sf)
    .filter(col("event_type") === "click")
    .select(get_json_object(col("props"), "$.k").as("item"))
    .groupBy("item").agg(count(lit(1)).as("n"))
    .select(hash64(col("item")).as("h"), col("n"))
    .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def probe(cnt: Seq[Long], h: Long): Long =
    (0 until CountMin.D).map { i =>
      cnt(i * CountMin.W +
        ((h >>> (CountMin.BitsPerRow * i)) & (CountMin.W - 1)).toInt)
    }.min

  test("count_min estimate >= exact for EVERY key (one-sided guarantee)") {
    val cnt = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select(get_json_object(col("props"), "$.k").as("item"))
      .agg(CountMin.count_min(hash64(col("item"))).as("cnt"))
      .collect().head.getSeq[Long](0)
    val exact = itemCounts
    assert(exact.nonEmpty)
    exact.foreach { case (h, n) =>
      assert(probe(cnt, h) >= n, s"under-estimate for hash $h")
    }
    // total inserted mass per row = N
    val n = exact.values.sum
    for (i <- 0 until CountMin.D)
      assert(cnt.slice(i * CountMin.W, (i + 1) * CountMin.W).sum === n)
  }

  test("count_min counters are merge-order invariant (1 vs 8 partitions)") {
    val src = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select(hash64(get_json_object(col("props"), "$.k")).as("h"))
    val a = src.repartition(1).agg(CountMin.count_min(col("h")))
      .collect().head.getSeq[Long](0)
    val b = src.repartition(8).agg(CountMin.count_min(col("h")))
      .collect().head.getSeq[Long](0)
    assert(a === b)
  }

  test("join_size_estimate: one-sided >= exact, within the CM error bound") {
    val row = analytics.Sketches.joinSizeEstimate(spark, sf).collect().head
    val exact = row.getLong(0)
    val est = row.getLong(1)
    assert(exact > 0L, "fixture needs a non-empty click x purchase join")
    assert(est >= exact, "CM inner product must never under-estimate")
    // error <= e * N_a * N_b / W with probability 1 - e^-D; use 3x slack
    val counts = Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bound = 3.0 * math.E * counts("click") * counts("purchase") /
      CountMin.W
    assert(est - exact <= bound, s"est=$est exact=$exact bound=$bound")
  }

  test("ngram_novelty = brute first-occurrence replay; first doc scores 100") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def grams(t: String): Set[String] =
      t.trim.toLowerCase.split("\\s+").sliding(text.CorpusOps.NGram)
        .filter(_.length == text.CorpusOps.NGram).map(_.mkString(" ")).toSet
    val firstDoc = scala.collection.mutable.Map.empty[String, Long]
    docs.sortBy(_._1).foreach { case (id, t) =>
      grams(t).foreach(g => if (!firstDoc.contains(g)) firstDoc(g) = id)
    }
    val got = text.CorpusOps.ngramNovelty(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    docs.foreach { case (id, t) =>
      val gs = grams(t)
      val novel = gs.count(g => firstDoc(g) == id).toLong
      assert(got(id) === ((gs.size.toLong, novel)), s"doc $id")
    }
    val minDoc = docs.map(_._1).min
    assert(got(minDoc)._1 === got(minDoc)._2,
      "the earliest doc must be 100% novel")
  }

  test("boilerplate_ngrams df = brute distinct-doc counts, floor respected") {
    val rows = text.CorpusOps.boilerplateNgrams(spark, sf).collect()
    val brute = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .flatMap { r =>
        r.getString(1).trim.toLowerCase.split("\\s+")
          .sliding(text.CorpusOps.NGram)
          .filter(_.length == text.CorpusOps.NGram)
          .map(_.mkString(" ")).toSet.toSeq
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      assert(r.getLong(1) === brute(r.getString(0)))
      assert(r.getLong(1) >= text.CorpusOps.MinDf)
    }
    // rows are the global top by (df desc, gram) — verify against brute
    val qualifying = brute.filter(_._2 >= text.CorpusOps.MinDf)
    val expTop = qualifying.toSeq.sortBy { case (g, d) => (-d, g) }
      .take(20).map(_._1)
    assert(rows.map(_.getString(0)).toSeq === expTop)
  }

  test("embed_outliers: per-label top-k farthest = brute centroid replay") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val centroids = vecs.groupBy(_._2).map { case (l, vs) =>
      val dim = vs.head._3.length
      l -> Array.tabulate(dim) { d =>
        math.rint(vs.map(_._3(d)).sum / vs.size * 1e6) / 1e6
      }
    }
    val exp: Map[(Int, Int), (Long, Double)] =
      vecs.groupBy(_._2).toSeq.flatMap { case (l, vs) =>
        val c = centroids(l)
        vs.toSeq.map { case (id, _, x) =>
          val d2 = x.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
          (id, math.sqrt(d2))
        }.sortBy { case (id, d) => (-d, id) }
          .take(ann.EmbedQc.TopK).zipWithIndex
          .map { case ((id, d), i) => (l, i + 1) -> ((id, d)) }
      }.toMap
    val got = ann.EmbedQc.embedOutliers(spark, sf).collect()
    assert(got.length === exp.size)
    got.foreach { r =>
      val (id, d) = exp((r.getInt(0), r.getInt(1)))
      assert(r.getLong(2) === id, s"label ${r.getInt(0)} rank ${r.getInt(1)}")
      assert(math.abs(r.getDouble(3) - d) < 1e-5)
    }
  }

  test("dup_rate_by_source partitions the minhash pair stream") {
    val docs = Tables.documents(spark, sf)
    val srcOf = docs.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = dedup.Dedup.minhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture needs near-dup pairs")
    val exp = pairs.map { case (a, b) =>
      val (sa, sb) = (srcOf(a), srcOf(b))
      if (sa <= sb) (sa, sb) else (sb, sa)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = text.CorpusOps.dupRateBySource(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === exp)
    assert(got.values.sum === pairs.length.toLong)
  }

  test("length_filter_sweep: full grid, monotone, brute counts") {
    val rows = text.CorpusOps.lengthFilterSweep(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq ===
      text.CorpusOps.LengthThresholds)
    val lens = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0).trim.split("\\s+").length.toLong)
    rows.foreach { r =>
      val thr = r.getInt(0)
      assert(r.getLong(1) === lens.count(_ >= thr).toLong)
      assert(r.getLong(2) === lens.filter(_ >= thr).sum)
    }
    // monotone: a higher cutoff never keeps more
    val kept = rows.map(_.getLong(1))
    assert(kept.zip(kept.tail).forall { case (a, b) => a >= b })
  }

  test("corpus_datacard partitions the corpus; token shares sum to 100") {
    val rows = text.CorpusOps.corpusDatacard(spark, sf).collect()
    assert(rows.map(_.getLong(2)).sum === Tables.documents(spark, sf).count())
    val pctSum = rows.map(_.getDouble(4)).sum
    assert(math.abs(pctSum - 100.0) < 0.05, s"token_pct sum $pctSum")
  }

  test("pair_negatives: reproducible, never a user's own item, bounded per pair") {
    import org.apache.spark.sql.functions.{col, get_json_object}
    import graft.pipeline.Negatives
    val pos = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .withColumn("item", get_json_object(col("props"), "$.k").cast("int"))
      .filter(col("item").isNotNull)
      .select("user_id", "item").distinct().collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val clicked = pos.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = Negatives.pairNegatives(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    // no negative is an item the user actually clicked
    got.foreach { case (u, _, _, neg) =>
      assert(!clicked(u).contains(neg), s"user $u leaked positive $neg")
    }
    // at most NegsPerPos per (user, positive); every pair was observed
    got.groupBy(t => (t._1, t._2)).foreach { case ((u, p), rs) =>
      assert(rs.length <= Negatives.NegsPerPos)
      assert(clicked(u).contains(p))
    }
    // reproducible: a second run returns byte-identical triples
    val again = Negatives.pairNegatives(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(got.toSeq == again.toSeq)
    // candidates in catalog range
    got.foreach { case (_, _, _, neg) =>
      assert(neg >= 1 && neg <= Negatives.CatalogSize)
    }
  }
}
