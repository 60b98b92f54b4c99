package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.InvariantCheck

/** The sf1 scale-verification invariants (tools/InvariantCheck) run at
  * sf0.01 on every test pass, so the checker itself is continuously
  * verified against data the DuckDB oracle also fully replays — at sf1
  * the same checks stand in for the infeasible >25-min replays of the
  * 5 iterative operators. */
class InvariantSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  private def assertAll(rs: Seq[InvariantCheck.Res]): Unit = {
    val bad = rs.filterNot(_.pass)
    assert(bad.isEmpty, bad.map(r => s"${r.name}: ${r.detail}").mkString("; "))
  }

  test("connected-components + keep-best invariants hold at sf0.01") {
    assertAll(InvariantCheck.checkClusters(spark, sf))
  }

  test("IVF invariants hold at sf0.01") {
    assertAll(InvariantCheck.checkIvf(spark, sf))
  }

  test("BPE replay invariants hold at sf0.01") {
    assertAll(InvariantCheck.checkBpe(spark, sf))
  }

  test("semantic-dedup invariants hold at sf0.01") {
    assertAll(InvariantCheck.checkSemantic(spark, sf))
  }

  test("PageRank + label-propagation invariants hold at sf0.01") {
    assertAll(InvariantCheck.checkGraph(spark, sf))
  }

  test("bitext-mining invariants hold at sf0.01") {
    assertAll(InvariantCheck.checkBitext(spark, sf))
  }

  test("IVF-PQ invariants hold at sf0.01") {
    assertAll(InvariantCheck.checkIvfPq(spark, sf))
  }

  test("BFS invariants hold") {
    assertAll(InvariantCheck.checkBfs(spark, sf))
  }

  test("k-core invariants hold") {
    assertAll(InvariantCheck.checkKcore(spark, sf))
  }

  test("invariants detect a planted violation (checker is not vacuous)") {
    // corrupt one cluster label and confirm the edge/min checks would
    // catch it — guard against a checker that trivially passes
    import org.apache.spark.sql.functions._
    val prop = pipeline.Pipeline.dedupClusters(spark, sf)
    val corrupted = prop.withColumn("cluster_id",
      when(col("doc_id") === col("cluster_id") && col("doc_id") > 0,
        col("cluster_id") + 1).otherwise(col("cluster_id")))
    val badMin = corrupted.groupBy("cluster_id").agg(min("doc_id").as("mn"))
      .filter(col("mn") =!= col("cluster_id")).count()
    assert(badMin > 0, "planted corruption must trip the min-member invariant")
  }

  test("growth/sweep/concentration conservation laws hold") {
    assertAll(InvariantCheck.checkGrowth(spark, sf))
  }

  test("round-8 layout/dedup/normalize/split invariants hold") {
    assertAll(InvariantCheck.checkRound8(spark, sf))
  }

  test("round-8 third-push invariants hold (cuped/lift/prune/conformal/...)") {
    assertAll(InvariantCheck.checkRound8b(spark, sf))
  }
}
