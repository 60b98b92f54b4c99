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

  test("skyline quadratic-dominance invariant holds at sf0.01") {
    assertAll(InvariantCheck.checkSkyline(spark, sf))
  }

  test("fuzzy-match soundness + reversed-blocking completeness hold") {
    assertAll(InvariantCheck.checkFuzzy(spark, sf))
  }

  test("label-consumer replays hold (host_quality/splits/balance/bias)") {
    assertAll(InvariantCheck.checkRound12(spark, sf))
  }

  test("round-12 checkers detect planted violations (not vacuous)") {
    import org.apache.spark.sql.functions._
    // skyline: a dominated point must fail the quadratic anti-join
    val o = Tables.orders(spark, sf)
    val byDate = o.groupBy(col("o_orderdate").as("d"))
      .agg(max("o_totalprice").as("p"))
    // plant: shift one non-minimal date's max DOWN so it is dominated,
    // then assert the dominance filter catches a frame that claims it
    // as frontier
    val planted = byDate.limit(2).withColumn("p", col("p") * 0.0001)
    val frontierOfPlanted = planted.as("a").join(byDate.as("b"),
      col("b.d") <= col("a.d") && col("b.p") >= col("a.p") &&
        (col("b.d") < col("a.d") || col("b.p") > col("a.p")), "left_semi")
    assert(frontierOfPlanted.count() > 0,
      "a price-squashed point must be detected as dominated")
    // make_splits: flipping one doc's split must trip the leak check
    val ms = pipeline.Splits.makeSplits(spark, sf)
    val corrupted = ms.withColumn("split",
      when(col("doc_id") === 0,
        when(col("split") === "train", "test").otherwise("train"))
        .otherwise(col("split")))
    val badRule = corrupted
      .withColumn("b2", pmod(text.TextFunctions.hash64(
        concat_ws(":", lit("mk"), col("cluster_id"))), lit(100)))
      .filter(col("split") =!= when(col("b2") < pipeline.Splits.TrainUpto, "train")
        .when(col("b2") < pipeline.Splits.ValUpto, "val").otherwise("test"))
      .count()
    assert(badRule > 0, "a flipped split must trip the hash-rule replay")
  }
}
