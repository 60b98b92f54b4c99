package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-10 operators: span cut-lists, URL canonicalization, host
  * rollup, topic-balanced mixture — structural invariants + replays
  * by independent formulations. */
class Round10OpsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  // ---- dup_spans_cut ----

  private lazy val cuts = graft.dedup.Substring.dupSpansCut(spark, sf)
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
  // (doc_id, span_idx, cut_start, cut_end, span_tokens, n_tokens,
  //  kept_tokens, residual_fp)

  test("dup_spans_cut spans are in-bounds, ordered, disjoint, >= k long, " +
       "and kept_tokens complements their union") {
    val k = graft.dedup.Substring.GramK
    assert(cuts.nonEmpty, "fixture has duplicated spans")
    cuts.groupBy(_._1).foreach { case (doc, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to rows.length).toSeq,
        s"doc $doc span_idx not 1..n")
      sorted.foreach { c =>
        assert(c._3 >= 1 && c._3 <= c._4 && c._4 <= c._6,
          s"doc $doc span out of bounds")
        assert(c._5 == c._4 - c._3 + 1 && c._5 >= k,
          s"doc $doc span shorter than gram size")
      }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 > a._4, s"doc $doc spans overlap or touch-merge failed")
        case _ => ()
      }
      val covered = sorted.map(_._5).sum
      assert(rows.head._7 == rows.head._6 - covered,
        s"doc $doc kept_tokens != n_tokens - covered union")
    }
  }

  test("dup_spans_cut agrees with dup_spans (span count + covered tokens) " +
       "and residual_fp replays via a brute range-join") {
    val perDoc = cuts.groupBy(_._1).map { case (d, rows) =>
      d -> (rows.length.toLong, rows.map(_._5).sum)
    }
    val ds = graft.dedup.Substring.dupSpans(spark, sf)
      .filter(col("n_dup_spans") > 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(ds.map(_._1).toSet == perDoc.keySet, "doc sets differ")
    ds.foreach { case (d, nSpans, covTok) =>
      assert(perDoc(d) == ((nSpans, covTok)), s"doc $d span stats differ")
    }
    // brute residual: token hashes minus any token inside a cut range
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.functions.native.token_poly_hashes(col("text")).as("th"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    cuts.groupBy(_._1).foreach { case (d, rows) =>
      val ranges = rows.map(c => (c._3, c._4))
      val residual = toks(d).zipWithIndex.collect {
        case (h, i) if !ranges.exists(r => i + 1 >= r._1 && i + 1 <= r._2) => h
      }.sum
      assert(rows.head._8 == residual, s"doc $d residual_fp mismatch")
    }
  }

  // ---- url_canonicalize ----

  private lazy val urls = graft.text.Urls.urlCanonicalize(spark, sf)
    .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getString(3)))

  test("url_canonicalize output is clean: lowercase scheme/host, no www/" +
       "default port/fragment/tracking params/dup slashes/index.html") {
    assert(urls.length ==
      Tables.documents(spark, sf).count(), "one row per doc")
    urls.foreach { case (id, raw, canon, host) =>
      assert(host.matches("src[0-9]+\\.example\\.com"), s"$id host $host")
      assert(canon.startsWith("http://") || canon.startsWith("https://"),
        s"$id scheme not canonical: $canon")
      val afterScheme = canon.substring(canon.indexOf("://") + 3)
      assert(!afterScheme.contains("//"), s"$id dup slashes: $canon")
      assert(!canon.contains("#") && !canon.contains("utm_"), s"$id $canon")
      assert(!canon.contains(":80/") && !canon.contains(":443/") &&
        !canon.endsWith(":80") && !canon.endsWith(":443"), s"$id port: $canon")
      assert(!canon.contains("www.") && !canon.contains("index.html"),
        s"$id $canon")
      assert(!canon.endsWith("/") || canon.endsWith("://" + host + "/"),
        s"$id trailing slash: $canon")
      // explicit non-default ports must survive
      if (raw.contains(":8080")) assert(canon.contains(":8080"), s"$id $canon")
      // surviving params are sorted
      val q = canon.indexOf('?')
      if (q >= 0) {
        val ps = canon.substring(q + 1).split("&").toSeq
        assert(ps == ps.sorted && ps.forall(_.nonEmpty), s"$id params: $canon")
      }
    }
  }

  test("url canonicalization is idempotent") {
    import spark.implicits._
    val again = urls.map(_._3).toSeq.toDF("u")
      .select(col("u"), graft.text.Urls.canonicalize(col("u")).as("u2"))
      .collect()
    again.foreach(r => assert(r.getString(0) == r.getString(1),
      s"not idempotent: ${r.getString(0)} -> ${r.getString(1)}"))
  }

  // ---- host_quality ----

  test("host_quality covers the corpus once and its flags replay from " +
       "its own integer columns") {
    val rows = graft.text.Urls.hostQuality(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(5), r.getBoolean(6)))
    val tDocs = rows.map(_._2).sum
    val tDup = rows.map(_._3).sum
    assert(tDocs == Tables.documents(spark, sf).count())
    rows.foreach { case (h, n, d, above, keep) =>
      assert(above == (d * tDocs > tDup * n), s"host $h above_avg_dup")
      assert(keep == (d * tDocs <= 2 * tDup * n), s"host $h keep")
    }
  }

  // ---- corpus_mix_topic ----

  test("corpus_mix_topic allocation is budget-exact and the 1/K cap binds " +
       "both ways") {
    import graft.pipeline.Pipeline.{MixBudget, TopicCapDen, TopicCapNum}
    val rows = graft.pipeline.Pipeline.corpusMixTopic(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getDouble(4),
        r.getLong(5)))
    // (topic_id, topic_tokens, natural_share, mix_weight, alloc_tokens)
    val alloc = rows.map(_._5).sum
    assert(alloc <= MixBudget, "allocation exceeds budget")
    assert(MixBudget - alloc < rows.length,
      "floor-division slack exceeds one token per topic")
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4, "weights sum to 1")
    val tot = rows.map(_._2).sum
    val capped = rows.filter(r => r._2 * TopicCapDen > tot * TopicCapNum)
    if (rows.length > 1 && rows.map(_._2).distinct.length > 1) {
      assert(capped.nonEmpty, "1/K cap binds on some head topic")
      capped.foreach(r => assert(r._4 <= r._3 + 1e-9,
        s"capped topic ${r._1} weight above natural share"))
    }
  }
}
