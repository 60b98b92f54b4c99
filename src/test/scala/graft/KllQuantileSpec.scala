package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.KllQuantile

/** §2.156 pin: the KLL quantile aggregate's merge laws and error
  * bound, independent of the oracle query. */
class KllQuantileSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val K = 128
  private val Qs = Seq(0.25, 0.5, 0.75, 0.95)

  /** Sketch n values through an explicit update/merge schedule. */
  private def sketch(vals: Seq[Double], chunks: Int, k: Int = K): KllQuantile.Buf = {
    val bufs = vals.grouped(math.max(1, vals.size / chunks)).map { g =>
      val b = new KllQuantile.Buf
      g.foreach(b.add(_, k))
      b
    }.toList
    bufs.reduce { (a, c) => a.mergeIn(c, k); a }
  }

  private def quantiles(b: KllQuantile.Buf, k: Int = K): Seq[Double] = {
    val agg = KllQuantile(
      org.apache.spark.sql.graftbridge.Bridge.expression(lit(1.0)),
      k, Qs.map(q => math.round(q * 1e6)))
    agg.eval(b).asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      .toDoubleArray().toSeq
  }

  private def exact(vals: Seq[Double], q: Double): Double = {
    val s = vals.sorted
    s((math.ceil(q * s.size).toInt - 1).max(0))
  }

  test("exact regime: any chunking/merge order gives exact order statistics") {
    val vals = (1 to 100).map(i => ((i * 37) % 101).toDouble) // shuffled 1..100
    val expected = Qs.map(exact(vals, _))
    for (chunks <- Seq(1, 3, 7, 100)) {
      assert(quantiles(sketch(vals, chunks)) === expected,
        s"chunks=$chunks diverged")
    }
    // reversed ingest order too
    assert(quantiles(sketch(vals.reverse, 5)) === expected)
  }

  test("merge is weight-conserving and associative on counts") {
    val a = sketch((1 to 300).map(_.toDouble), 2)
    val b = sketch((301 to 700).map(_.toDouble), 3)
    val n0 = a.count + b.count
    a.mergeIn(b, K)
    assert(a.count === n0)
    // total retained weight equals the ingested count even after compaction
    val w = a.weighted().map(_(1).toLong).sum
    assert(w === n0, s"retained weight $w != ingested $n0")
  }

  test("compacted regime: rank error within the sketch bound") {
    // 50k values, k=128 → heavy compaction; assert observed rank error
    // ≤ 4·n/k (comfortably inside the KLL constant for this variant)
    val n = 50000
    val vals = (0 until n).map(i => ((i.toLong * 48271) % 100003).toDouble)
    val got = quantiles(sketch(vals, 8))
    val sorted = vals.sorted
    val bound = 4.0 * n / K
    Qs.zip(got).foreach { case (q, v) =>
      val rank = sorted.count(_ <= v)
      val target = math.ceil(q * n)
      assert(math.abs(rank - target) <= bound,
        s"q=$q: rank $rank vs target $target (bound $bound)")
    }
  }

  test("deterministic: same schedule twice gives identical doubles") {
    val vals = (0 until 10000).map(i => ((i * 7919) % 65537).toDouble)
    assert(quantiles(sketch(vals, 6)) === quantiles(sketch(vals, 6)))
  }

  test("serialization round-trips the full state") {
    val b = sketch((1 to 5000).map(_.toDouble), 4)
    val back = KllQuantile.Buf.fromBytes(b.toBytes)
    assert(back.count === b.count)
    assert(quantiles(back) === quantiles(b))
  }

  test("SQL registration: graft_quantile matches the DataFrame path") {
    GraftFunctions.register(spark)
    val df = (1 to 1000).map(i => (i % 4, ((i * 193) % 997).toDouble))
      .toDF("g", "v")
    df.createOrReplaceTempView("kll_probe")
    val viaSql = spark.sql(
      "SELECT g, graft_quantile(v, 2048, 0.5, 0.95) AS qs FROM kll_probe GROUP BY g")
      .select($"g", element_at($"qs", 1), element_at($"qs", 2))
      .orderBy("g").collect().map(_.toSeq)
    val viaDf = df.groupBy("g")
      .agg(KllQuantile.kll_quantile($"v", 2048, Seq(0.5, 0.95)).as("qs"))
      .select($"g", element_at($"qs", 1), element_at($"qs", 2))
      .orderBy("g").collect().map(_.toSeq)
    assert(viaSql.toSeq === viaDf.toSeq)
  }

  test("empty group yields NaN markers, not a crash") {
    val b = new KllQuantile.Buf
    assert(quantiles(b).forall(_.isNaN))
  }
}
