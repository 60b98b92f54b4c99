package graft

import org.scalatest.funsuite.AnyFunSuite

/** Brute-force replays for the physical-layout planners (§2.275–277). */
class LayoutSpec extends AnyFunSuite {
  import SparkTestSession.spark

  val sf: String = SparkTestSession.sf

  test("shard_plan = brute greedy packing; conserves docs and chars") {
    val docs = Tables.documents(spark, sf)
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val assigned: Seq[((String, Long), (Long, Long))] =
      docs.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
        var cum = 0L
        ds.sortBy(_._2).map { case (_, id, ch) =>
          cum += ch
          ((src, (cum - 1) / etl.Layout.ShardTargetChars), (id, ch))
        }.toSeq
      }
    val expect = assigned.groupBy(_._1).map { case (k, xs) =>
      val ids = xs.map(_._2._1)
      k -> ((xs.length.toLong, xs.map(_._2._2).sum, ids.min, ids.max))
    }
    val got = etl.Layout.shardPlan(spark, sf).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val k = (r.getString(0), r.getLong(1))
      assert(expect(k) == ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))), s"shard $k")
    }
    // conservation: every doc lands in exactly one shard
    assert(got.map(_.getLong(2)).sum == docs.length.toLong)
    assert(got.map(_.getLong(3)).sum == docs.map(_._3).sum)
  }

  test("salt_plan factors cap every post-salt partition at the target") {
    val t = etl.Layout.SaltTargetRows
    val counts = Tables.events(spark, sf).collect()
      .groupBy(_.getString(3)).map { case (k, v) => k -> v.length.toLong }
    val got = etl.Layout.saltPlan(spark, sf).collect()
    assert(got.length == counts.size)
    got.foreach { r =>
      val (k, n, f, mx) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n == counts(k), s"count $k")
      assert(f == (n + t - 1) / t, s"factor $k")
      assert(mx == (n + f - 1) / f && mx <= t, s"post-salt max $k")
      assert(r.getBoolean(4) == (f > 1L))
    }
  }

  test("encoding_stats = brute run/distinct replay in the total order") {
    val li = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "l_linenumber",
        "l_returnflag", "l_linestatus",
        "date_format(l_shipdate, 'yyyy-MM-dd')",
        "cast(l_partkey as string)",
        "cast(cast(l_quantity as long) as string)")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        Seq(r.getString(2), r.getString(3), r.getString(4),
          r.getString(5), r.getString(6))))
    val names = Seq("l_returnflag", "l_linestatus", "l_shipdate",
      "l_partkey", "l_quantity")
    val byRg = li.groupBy(_._1 / etl.Layout.RowGroupOrderKeys)
    val runs = Array.fill(5)(0L)
    byRg.values.foreach { g =>
      val sorted = g.sortBy(x =>
        (x._1, x._2, x._3(0), x._3(1), x._3(2), x._3(3), x._3(4)))
      for (i <- 0 until 5) {
        runs(i) += 1
        sorted.toSeq.sliding(2).foreach {
          case Seq(a, b) => if (a._3(i) != b._3(i)) runs(i) += 1
          case _ =>
        }
      }
    }
    val distinct = (0 until 5).map(i => li.map(_._3(i)).distinct.length.toLong)
    val got = etl.Layout.encodingStats(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    names.zipWithIndex.foreach { case (c, i) =>
      assert(got(c) == ((li.length.toLong, distinct(i), runs(i))), c)
    }
  }
}
