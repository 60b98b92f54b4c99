package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** §2.175 kmv_intersect: the KMV set-algebra laws, checked against a
  * brute-force sketch rebuilt from raw hashes. */
class KmvIntersectSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  test("union sketch = k smallest of merged; rho counts both-members; estimates match") {
    import graft.text.TextFunctions.hash64
    val k = analytics.Sketches.K
    def hashes(t: String): Array[Long] = Tables.events(spark, sf)
      .filter(col("event_type") === t)
      .select(hash64(col("user_id").cast("string")).as("h"))
      .distinct().collect().map(_.getLong(0))
    val (ha, hb) = (hashes("click"), hashes("purchase"))
    val (ka, kb) = (ha.sorted.take(k).toSet, hb.sorted.take(k).toSet)
    val uk = (ka ++ kb).toSeq.sorted.take(k)
    val rho = uk.count(x => ka.contains(x) && kb.contains(x))
    val estUnion =
      if (uk.size < k) uk.size.toDouble
      else math.rint((k - 1) / (uk.last / 1152921504606846976.0) * 1e4) / 1e4
    val row = analytics.Sketches.kmvIntersect(spark, sf).collect().head
    assert(row.getDouble(0) === math.rint(estUnion * 1e4) / 1e4)
    assert(row.getDouble(1) === math.rint(rho.toDouble / uk.size * 1e4) / 1e4)
    assert(row.getDouble(2) ===
      math.rint(rho.toDouble / k * estUnion * 1e4) / 1e4)
    // exact baseline columns really are exact
    val users = (t: String) => Tables.events(spark, sf)
      .filter(col("event_type") === t).select("user_id")
      .distinct().collect().map(_.getLong(0)).toSet
    val (ua, ub) = (users("click"), users("purchase"))
    assert(row.getLong(3) === ua.size.toLong)
    assert(row.getLong(4) === ub.size.toLong)
    assert(row.getLong(5) === (ua & ub).size.toLong)
  }
}
