package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.storage.StorageLevel

class CachesSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("MemoCache builds once per (session, dir) and clears on demand") {
    var builds = 0
    val cache = new MemoCache[Int](4)(_ => ())
    def get(dir: String) = cache.getOrElseUpdate(spark, dir) { builds += 1; builds }
    assert(get("a") == 1 && get("a") == 1 && builds == 1)
    assert(get("b") == 2 && builds == 2)
    cache.clear()
    assert(cache.size == 0)
    assert(get("a") == 3 && builds == 3) // rebuilt after clear
  }

  test("MemoCache bounds entries and eviction unpersists the evicted frame") {
    val cache = new MemoCache[org.apache.spark.sql.DataFrame](2)(
      _.unpersist(blocking = true))
    // distinct plans per dir — identical plans would share one
    // CacheManager entry and confuse the storageLevel probe
    def put(dir: String, n: Int) = cache.getOrElseUpdate(spark, dir)(
      spark.range(n).toDF("v").persist(StorageLevel.MEMORY_AND_DISK))
    val first = put("d1", 10); put("d2", 20); put("d3", 30) // d1 oldest → evicted
    assert(cache.size == 2)
    assert(first.storageLevel == StorageLevel.NONE,
      s"evicted frame still persisted at ${first.storageLevel}")
    val d2 = cache.getOrElseUpdate(spark, "d2")(fail("d2 should be cached"))
    assert(d2.count() == 20)
    assert(d2.storageLevel != StorageLevel.NONE)
    cache.clear()
    assert(d2.storageLevel == StorageLevel.NONE, "clear() must unpersist")
  }

  test("releaseStorage frees localCheckpoint blocks on eviction " +
       "(plain unpersist is a no-op on them — ADVICE r10)") {
    import org.apache.spark.sql.graftbridge.Bridge
    val cache = new MemoCache[org.apache.spark.sql.DataFrame](1)(
      Bridge.releaseStorage)
    // a localCheckpointed RDD lives in sc.getPersistentRDDs until ITS
    // unpersist runs; RDD.unpersist drops the registry entry
    // synchronously even with blocking=false, so the registry size is
    // a deterministic release signal (Dataset.unpersist — the old
    // evictor — never reaches that RDD and would leave it registered)
    def registered() = spark.sparkContext.getPersistentRDDs.size
    // quiesce: drop anything left persisted by sibling tests
    Caches.clearAll()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    assert(registered() == 0)
    def put(dir: String, n: Int) = cache.getOrElseUpdate(spark, dir)(
      spark.range(n).toDF("v").localCheckpoint())
    put("c1", 1000)
    assert(registered() == 1, "localCheckpoint RDD not registered?")
    put("c2", 2000) // evicts c1 (capacity 1) → releaseStorage runs
    assert(registered() == 1,
      "evicted localCheckpoint RDD still registered — blocks leaked")
    cache.clear()
    assert(registered() == 0, "clear() must release checkpoint blocks")
  }

  test("entries are keyed by session identity, not dir alone") {
    val cache = new MemoCache[String](4)(_ => ())
    val other = spark.newSession()
    assert(cache.getOrElseUpdate(spark, "d")("from-main") == "from-main")
    assert(cache.getOrElseUpdate(other, "d")("from-other") == "from-other")
    assert(cache.size == 2)
  }

  test("Caches.clearAll resets registered caches (the Bench between-reps hook)") {
    val cache = new MemoCache[Int](4)(_ => ())
    cache.getOrElseUpdate(spark, "x")(1)
    assert(cache.size == 1)
    Caches.clearAll()
    assert(cache.size == 0)
  }
}
