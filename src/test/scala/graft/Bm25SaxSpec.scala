package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Brute-force parity for §2.178 bm25_topk / §2.179 sax_symbols. */
class Bm25SaxSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  test("bm25_topk = brute-force Okapi BM25 ranking") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).trim.toLowerCase.split("\\s+").toSeq))
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.size).sum.toDouble / n
    val q = text.Bm25.QueryTerms
    val dfm = q.map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
    val scores = docs.flatMap { case (id, toks) =>
      val contribs = q.flatMap { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) None else Some(
          math.log(1.0 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5)) *
            tf * (text.Bm25.K1 + 1.0) /
            (tf + text.Bm25.K1 *
              (1.0 - text.Bm25.B + text.Bm25.B * toks.size / avgdl)))
      }
      if (contribs.isEmpty) None
      else Some((id, math.rint(contribs.sum * 1e6) / 1e6, contribs.size.toLong))
    }
    val expected = scores.sortBy { case (id, s, _) => (-s, id) }
      .take(text.Bm25.TopK)
    val got = text.Bm25.bm25Topk(spark, sf).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.length === expected.length)
    got.zip(expected).foreach { case ((gi, gs, gh), (ei, es, eh)) =>
      assert(gi === ei)
      assert(math.abs(gs - es) < 1e-5, s"doc $gi: $gs vs $es")
      assert(gh === eh)
    }
  }

  test("bm25 postings filter reaches the tf aggregation (inverted-index shape)") {
    val plan = text.Bm25.bm25Topk(spark, sf).queryExecution.sparkPlan.toString
    // TakeOrdered, not a global Sort+Limit of separate operators
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
  }

  test("sax_symbols = brute-force z-breakpoint symbolization") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum("value").as("v")).collect()
      .map(r => (r.getString(0), r.getDate(1), r.getDouble(2)))
    val expected = daily.groupBy(_._1).map { case (et, rs) =>
      val vs = rs.map(_._3)
      val mu = vs.sum / vs.length
      val sigma = math.sqrt(vs.map(v => (v - mu) * (v - mu)).sum / (vs.length - 1))
      val word = rs.sortBy(_._2.toString).map { case (_, _, v) =>
        val z = (v - mu) / sigma
        if (z < -0.6745) "a" else if (z < 0.0) "b"
        else if (z < 0.6745) "c" else "d"
      }.mkString
      et -> (rs.length.toLong, word)
    }
    val got = analytics.Sax.saxSymbols(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got === expected)
    // a 4-letter alphabet over a z-normalized series uses every band
    got.values.foreach { case (nd, w) =>
      assert(w.length === nd.toInt)
      assert(w.toSet.subsetOf(Set('a', 'b', 'c', 'd')))
    }
  }
}
