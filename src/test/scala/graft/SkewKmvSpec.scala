package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.functions.KMinValues.kmin_values

class SkewKmvSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  test("salted join returns exactly the plain join's rows") {
    val li = Tables.lineitem(spark, sf)
      .withColumnRenamed("l_orderkey", "o_orderkey")
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val plain = li.join(ord, "o_orderkey")
    val salted = Skew.saltedJoin(li, ord, "o_orderkey", 8)
    assert(salted.count() == plain.count())
    assert(salted.columns.sorted.sameElements(plain.columns.sorted))
    val a = plain.agg(sum("o_totalprice"), sum("l_quantity")).head()
    val b = salted.agg(sum("o_totalprice"), sum("l_quantity")).head()
    assert(a == b)
  }

  test("KMV buffer keeps the k smallest distinct values and merges") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => i * 37 % 1009).toDF("h")
      .repartition(7) // force partial buffers + merge
    val kmv = df.agg(kmin_values(col("h"), 10)).head().getSeq[Long](0)
    val expected = (1L to 1000L).map(i => i * 37 % 1009).distinct.sorted.take(10)
    assert(kmv == expected)
  }

  test("KMV distinct estimate lands near the exact count") {
    import graft.text.TextFunctions.hash64
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
    val r = ev.agg(
      kmin_values(hash64(col("user_id").cast("string")), 64).as("kmv"),
      countDistinct(col("user_id")).as("exact")).head()
    val kth = r.getSeq[Long](0).last.toDouble
    val exact = r.getLong(1).toDouble
    val est = 63.0 / (kth / 1152921504606846976.0)
    assert(math.abs(est - exact) / exact < 0.4, s"est $est exact $exact")
  }
}
