package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.EtlQueries
import graft.dq.Referential

/** §2.134–135: scd2_history, dq_referential — brute-force-verified
  * over the collected sf0.001 tables, plus a planted-orphan check so
  * the referential audit can't pass vacuously. */
class NewEtlOpsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  test("scd2_history = brute-force run-collapse; intervals chain per user") {
    val events = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val expected = events.groupBy(_._1).view.mapValues { es =>
      val sorted = es.sortBy(e => (e._2.getTime, e._3))
      // collapse consecutive same-status runs
      val runs = sorted.foldLeft(List.empty[(java.sql.Timestamp, String)]) {
        case (acc, (_, ts, _, st)) =>
          if (acc.headOption.exists(_._2 == st)) acc
          else (ts, st) :: acc
      }.reverse
      runs.zipWithIndex.map { case ((from, st), i) =>
        val to = if (i + 1 < runs.length) Some(runs(i + 1)._1) else None
        (i + 1, st, from, to)
      }
    }.toMap
    val got = EtlQueries.scd2History(spark, sf).collect()
    assert(got.length == expected.values.map(_.length).sum)
    got.foreach { r =>
      val u = r.getLong(0)
      val v = r.getInt(1)
      val (ev, est, efrom, eto) = {
        val e = expected(u)(v - 1); (e._1, e._2, e._3, e._4)
      }
      assert(v == ev && r.getString(2) == est, s"user=$u v=$v")
      assert(r.getTimestamp(3) == efrom, s"valid_from user=$u v=$v")
      assert(Option(r.getTimestamp(4)) == eto, s"valid_to user=$u v=$v")
      assert(r.getBoolean(5) == eto.isEmpty, s"is_current user=$u v=$v")
    }
    // structure: exactly one current version per user, intervals chain
    val byUser = got.groupBy(_.getLong(0))
    byUser.values.foreach { rs =>
      assert(rs.count(_.getBoolean(5)) == 1)
      val sorted = rs.sortBy(_.getInt(1))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getTimestamp(4) == b.getTimestamp(3),
          "valid_to must equal next valid_from")
        case _ =>
      }
    }
  }

  test("dq_referential: clean FKs audit green; planted orphans are caught") {
    val got = Referential.dqReferential(spark, sf).collect()
    assert(got.length == 2)
    // this corpus has referentially-intact FKs and some childless parents
    got.foreach { r =>
      assert(r.getLong(3) == 0 && r.getLong(4) == 0, s"orphans in ${r.getString(0)}")
      assert(r.getString(7) == "", "sample must be empty when no orphans")
    }
    val childless = got.map(r => r.getString(0) -> r.getLong(5)).toMap
    val custKeys = Tables.customer(spark, sf).select("c_custkey")
      .collect().map(_.getLong(0)).toSet
    val orderCust = Tables.orders(spark, sf).select("o_custkey")
      .collect().map(_.getLong(0)).toSet
    assert(childless("orders.o_custkey->customer") == (custKeys -- orderCust).size)
    val orderKeys = Tables.orders(spark, sf).select("o_orderkey")
      .collect().map(_.getLong(0)).toSet
    val liOrders = Tables.lineitem(spark, sf).select("l_orderkey")
      .collect().map(_.getLong(0)).toSet
    assert(childless("lineitem.l_orderkey->orders") == (orderKeys -- liOrders).size)
    // planted orphans: drop some parents, audit must count and sample them
    import spark.implicits._
    val child = Seq((1L, "a"), (1L, "b"), (2L, "c"), (9L, "d"), (10L, "e"))
      .toDF("fk", "payload")
    val parent = Seq(1L, 3L).toDF("pk")
    val r = Referential.rel("t", child, "fk", parent, "pk").collect()(0)
    assert(r.getLong(1) == 5 && r.getLong(2) == 2)
    assert(r.getLong(3) == 3, "orphan rows: 2,9,10 rows")
    assert(r.getLong(4) == 3, "orphan keys: {2,9,10}")
    assert(r.getLong(5) == 1, "childless: {3}")
    // string-ordered min-3 sample: "10" < "2" < "9"
    assert(r.getString(7) == "10,2,9", s"got sample ${r.getString(7)}")
  }
}
