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
}
