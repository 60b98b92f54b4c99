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
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    if (noAqe) builder.config("spark.sql.adaptive.enabled", "false")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"[profile] $name rep$r ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows, aqe=${!noAqe})")
    }
    spark.stop()
  }
}
