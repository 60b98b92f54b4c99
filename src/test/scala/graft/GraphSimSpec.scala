package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Brute-force parity for §2.173 jaccard_neighbors / §2.174 hub_authority. */
class GraphSimSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  private def clicks(): Array[(Long, Long)] =
    Tables.events(spark, sf).filter(col("event_type") === "click")
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct

  test("jaccard_neighbors = brute-force user-set Jaccard per item pair") {
    val ui = clicks()
    val users = ui.groupBy(_._2).map { case (i, rs) => i -> rs.map(_._1).toSet }
    val items = users.keys.toSeq.sorted
    val expected = (for {
      a <- items; b <- items if a < b
      inter = (users(a) & users(b)).size if inter > 0
      j = math.rint(inter.toDouble / (users(a) ++ users(b)).size * 1e6) / 1e6
      if j >= graph.Graph.MinJaccard
    } yield (a, b) -> (inter.toLong, users(a).size.toLong, users(b).size.toLong, j)).toMap
    val got = graph.Graph.jaccardNeighbors(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got === expected)
  }

  test("jaccard pair generation joins by user and broadcasts the degree frames") {
    val plan = graph.Graph.jaccardNeighbors(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "no all-pairs path in the similarity join")
  }

  test("hub_authority = unrolled brute-force HITS, L1-normalized") {
    val e = clicks().map { case (u, i) => (u, i) }
    val a1 = e.groupBy(_._2).map { case (i, rs) => i -> rs.size.toDouble }
    val h1 = e.groupBy(_._1).map { case (u, rs) => u -> rs.map(r => a1(r._2)).sum }
    val a2 = e.groupBy(_._2).map { case (i, rs) => i -> rs.map(r => h1(r._1)).sum }
    val s = a2.values.sum
    val expected = a2.view.mapValues(v => math.rint(v / s * 1e6) / 1e6).toMap
    val got = graph.Graph.hubAuthority(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.length === math.min(20, a2.size))
    // result is the top-20 slice of the brute ranking, same values
    val bruteTop = expected.toSeq.sortBy { case (i, v) => (-v, i) }.take(got.length)
    assert(got.toSeq === bruteTop)
  }
}
