package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** §2.180 quality_classifier: the distributed GD loop reproduces a
  * driver-side brute-force fit exactly (the 9 dp gradient barrier). */
class QualityModelSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  test("3-round batch GD = brute force, and the fit beats majority class") {
    val rows = text.TextQueries.qualityFrame(Tables.documents(spark, sf))
      .select(
        when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
        round(col("_alpha"), 6), round(col("_stop"), 6),
        round(least(lit(1.0), col("n_tokens").cast("double") / 100.0), 6))
      .collect()
      .map(r => (r.getDouble(0), Array(1.0, r.getDouble(1), r.getDouble(2), r.getDouble(3))))
    def r9(v: Double) = math.rint(v * 1e9) / 1e9
    var w = Array(0.0, 0.0, 0.0, 0.0)
    for (_ <- 1 to pipeline.QualityModel.Iters) {
      val g = Array.fill(4)(0.0)
      rows.foreach { case (y, x) =>
        val z = w.zip(x).map { case (a, b) => a * b }.sum
        val e = y - 1.0 / (1.0 + math.exp(-z))
        for (j <- 0 until 4) g(j) += e * x(j)
      }
      for (j <- 0 until 4)
        w(j) += pipeline.QualityModel.Lr * r9(g(j) / rows.length)
    }
    val correct = rows.count { case (y, x) =>
      (w.zip(x).map { case (a, b) => a * b }.sum >= 0) == (y == 1.0) }
    val row = pipeline.QualityModel.qualityClassifier(spark, sf).collect().head
    for (j <- 0 until 4)
      assert(math.abs(row.getDouble(j) - r9(w(j))) < 1e-9, s"w$j")
    assert(row.getLong(4) === rows.length.toLong)
    assert(row.getLong(5) === correct.toLong)
    // the classifier must do at least as well as always-guessing-majority
    val nPos = rows.count(_._1 == 1.0)
    assert(correct >= math.max(nPos, rows.length - nPos))
  }
}
