package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiler for the iterative/tiny-stat queries (dev tool):
  * times a named SparkEntry query under the bench session config,
  * optionally toggling AQE, to separate plan/scheduling overhead from
  * real work. Usage: runMain graft.tools.Profile <query> [reps] [noaqe] */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "bpe_merges"
    val reps = if (args.length > 1) args(1).toInt else 3
    val noAqe = args.contains("noaqe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build("local[32]", "graft-profile",
      dataDir = Some(dir), cores = 32)
    // AQE is a runtime-settable SQL conf; toggle on the built session
    if (noAqe) spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    val clear = args.contains("clear") // bench-rep semantics: cold memo caches
    (1 to reps).foreach { r =>
      if (clear) graft.Caches.clearAll()
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"[profile] $name rep$r ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows, aqe=${!noAqe})")
    }
    spark.stop()
  }
}
