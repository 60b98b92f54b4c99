package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ann.GraphAnn

/** §2.333 graph-ANN structural invariants — the properties the SQL
  * oracle replay can't articulate on its own. */
class GraphAnnSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  test("kNN graph: out-degree <= KG, no self-loops, cs matches a direct " +
       "cosine recomputation") {
    val emb = Tables.embeddings(spark, sf)
    val g = GraphAnn.knnGraph(emb)
    val deg = g.groupBy("node").agg(count(lit(1)).as("d"))
      .agg(max("d")).head().getLong(0)
    assert(deg <= GraphAnn.KG, s"max out-degree $deg > ${GraphAnn.KG}")
    assert(g.filter(col("node") === col("nbr")).count() == 0, "self-loop")
    // recompute cosine for every edge from the vectors — the graph's
    // cs column must be the genuine pairwise cosine, not a stale or
    // partially-updated score
    val v = emb.select(col("vec_id"),
      graft.functions.native.to_double_array(col("embedding")).as("e"))
      .withColumn("nrm", graft.ann.Ann.normCol(col("e")))
    val bad = g
      .join(v.select(col("vec_id").as("node"), col("e").as("ae"),
        col("nrm").as("an")), Seq("node"))
      .join(v.select(col("vec_id").as("nbr"), col("e").as("be"),
        col("nrm").as("bn")), Seq("nbr"))
      .filter(col("cs") =!=
        graft.ann.Ann.dotCol(col("ae"), col("be")) / (col("an") * col("bn")))
      .count()
    assert(bad == 0, s"$bad edges with cs != recomputed cosine")
  }

  test("graphTopK = exact top-k of the visited set, k rows per query, " +
       "rk dense from 1") {
    val emb = Tables.embeddings(spark, sf)
    val nq = 5; val k = 10
    val res = GraphAnn.graphTopK(emb, nq, k).collect()
    assert(res.length == nq * k)
    val byQ = res.groupBy(_.getLong(0))
    assert(byQ.keySet == (0 until nq).map(_.toLong).toSet)
    for ((q, rows) <- byQ) {
      val rks = rows.map(_.getInt(1)).sorted.toSeq
      assert(rks == (1 to k), s"q=$q ranks $rks")
      // cosines non-increasing in rank, ties broken by vec_id asc
      val ordered = rows.sortBy(_.getInt(1))
        .map(r => (r.getDouble(3), r.getLong(2)))
      assert(ordered.sliding(2).forall { case Array((c1, v1), (c2, v2)) =>
        c1 > c2 || (c1 == c2 && v1 < v2) }, s"q=$q not sorted")
    }
    // brute consistency: the reported top-k IS the top-k of everything
    // beam search scored (same ordering rule, 6 dp output rounding)
    val vis = GraphAnn.visitedSet(emb, nq)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    for ((q, rows) <- byQ) {
      // HALF_UP like Spark's round(), NOT math.rint (half-even) — the
      // standing cross-engine tie trap
      val want = vis.filter(_._1 == q).sortBy { case (_, id, cs) => (-cs, id) }
        .take(k).map { case (_, id, cs) =>
          (id, BigDecimal(cs).setScale(6,
            scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble) }.toSeq
      val got = rows.sortBy(_.getInt(1)).map(r => (r.getLong(2), r.getDouble(3))).toSeq
      assert(got == want, s"q=$q: reported top-$k != visited-set top-$k")
    }
  }
}
