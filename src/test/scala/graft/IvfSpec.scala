package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ann.{Ann, Ivf}

class IvfSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  test("ivf trains K centroids of the right shape") {
    val cent = Ivf.trainCentroids(Tables.embeddings(spark, sf)).collect()
    assert(cent.length == Ivf.K)
    assert(cent.map(_.getLong(0)).sorted.sameElements(0L until Ivf.K.toLong))
    cent.foreach { r =>
      assert(r.getSeq[Double](1).length == Ivf.Dim)
      assert(r.getDouble(2) > 0.0) // non-degenerate norm
    }
  }

  test("ivf returns k well-ordered results per query") {
    val out = Ivf.ivfTopK(Tables.embeddings(spark, sf)).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.size == 5)
    byQ.foreach { case (q, rows) =>
      assert(rows.length == 10, s"query $q returned ${rows.length} rows")
      assert(rows.map(_.getInt(1)).sorted.sameElements(1 to 10))
      // cosines non-increasing with rank; self excluded
      val cos = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
      assert(!rows.map(_.getLong(2)).contains(q))
    }
  }

  test("ivf recall@10 vs brute force is useful (> 0.4)") {
    val exact = Ann.bruteForceTopK(Tables.embeddings(spark, sf)).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val approx = Ivf.ivfTopK(Tables.embeddings(spark, sf)).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val recalls = exact.keys.toSeq.map { q =>
      approx.getOrElse(q, Set.empty).intersect(exact(q)).size.toDouble / exact(q).size
    }
    val mean = recalls.sum / recalls.size
    assert(mean > 0.4, s"mean recall@10 = $mean")
  }

  test("ivf is deterministic across runs") {
    val a = Ivf.ivfTopK(Tables.embeddings(spark, sf)).collect().toSeq
    val b = Ivf.ivfTopK(Tables.embeddings(spark, sf)).collect().toSeq
    assert(a == b)
  }

  test("semantic dedup: verdicts are sound, complete, and keep the most central") {
    import graft.ann.SemDedup
    val emb = Tables.embeddings(spark, sf)
    val out = SemDedup.semanticDedup(emb)
    val rows = out.collect()
    assert(rows.length == emb.count())
    val dups = rows.filter(_.getBoolean(3))
    assert(dups.nonEmpty, "planted near-dup embeddings must produce duplicates")
    // brute-force reference: recompute every in-cluster qualifying pair
    val byId = rows.map(r => r.getLong(0) ->
      (r.getLong(1), r.getDouble(2))).toMap // vec_id -> (cid, cent_cos)
    val v = Ivf.vecsD(emb).collect()
      .map(r => r.getLong(0) -> (r.getSeq[Double](1).toArray, r.getDouble(2))).toMap
    def cos(i: Long, j: Long): Double = {
      val (ei, ni) = v(i); val (ej, nj) = v(j)
      val d = ei.zip(ej).map { case (x, y) => x * y }.sum
      BigDecimal(d / (ni * nj)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val ord = Ordering.Tuple2[Double, Long]
    def rank(id: Long): (Double, Long) = (byId(id)._2, -id) // higher = more central
    for (r <- rows) {
      val id = r.getLong(0); val cid = r.getLong(1)
      val better = byId.collect { case (j, (cj, _)) if cj == cid && j != id &&
        ord.gt(rank(j), rank(id)) && cos(id, j) >= SemDedup.MinCos => j }.toSeq
      if (r.getBoolean(3)) {
        val dupOf = r.getLong(4)
        assert(better.contains(dupOf), s"$id defers to non-qualifying $dupOf")
        assert(rank(dupOf) == better.map(rank).max(ord), s"$id not deferring to best")
        assert(r.getDouble(5) == cos(id, dupOf))
      } else {
        assert(better.isEmpty, s"$id kept despite more-central near-dup")
      }
    }
    // the most central member of each cluster can never be a duplicate
    rows.groupBy(_.getLong(1)).values
      .map(_.maxBy(r => (r.getDouble(2), -r.getLong(0)))(ord))
      .foreach(r => assert(!r.getBoolean(3)))
  }
}
