package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Regression parity for the round-8 fixes. */
class Round8OpsSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("did_estimate floors the midpoint on an ODD calendar span") {
    // 7-day span (odd): half must floor to 3, so day offsets 0..2 are
    // "pre" and 3..7 are "post". A round-to-nearest midpoint (the old
    // DuckDB-oracle CAST semantics) would put half=4 and flip day 3.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("did_odd").toString
    val rows = (0 to 7).flatMap { d =>
      // one even-user click per day, plus a purchase ONLY on day 3 —
      // the disputed day: under floor it lands post, under round pre
      val ts = java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00")
      val click = (d.toLong, ts, 2L, "click", 1.0, "{}")
      if (d == 3) Seq(click, (100L + d, ts, 2L, "purchase", 1.0, "{}"))
      else Seq(click)
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.analytics.Stats.didEstimate(spark, dir).collect().head
    // arm A (even users), pre = days 0..2 -> 3 clicks 0 purchases;
    // post = days 3..7 -> 5 clicks + 1 purchase -> rate 1/6
    assert(r.getDouble(0) == 0.0, "rate_a_pre: day 3 must NOT be pre")
    assert(math.abs(r.getDouble(1) - 1.0 / 6.0) < 1e-5, "rate_a_post")
  }

  test("ab_test_multi fails loudly when hypothesis count != BhCritZ grid size") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ab_m").toString
    // only 2 event types (< the 5-rung grid) across both arms
    val rows = for {
      u <- 0L until 40L; t <- Seq("click", "view")
    } yield (u * 2 + (if (t == "click") 0 else 1),
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), u, t,
      (u % 7).toDouble, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ex = intercept[Exception] {
      graft.analytics.Stats.abTestMulti(spark, dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("hypothesis count")),
      s"expected the BhCritZ-grid assert, got: $ex")
  }

  test("attribution_markov channel-set guard matches the oracle's chain list") {
    // the oracle SQL unrolls a removal chain per MarkovChannels entry;
    // the Spark side must keep asserting the observed set equals it
    assert(graft.analytics.Mining.MarkovChannels ==
      Seq("click", "error", "signup", "view"))
    // and the real corpus still satisfies the guard (no throw)
    val out = graft.analytics.Mining
      .attributionMarkov(spark, SparkTestSession.sf).collect()
    assert(out.map(_.getString(0)).toSeq ==
      graft.analytics.Mining.MarkovChannels)
  }
}
