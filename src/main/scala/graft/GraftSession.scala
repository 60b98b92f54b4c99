package graft

import org.apache.spark.sql.SparkSession

/** Convenience session builder with graft's tuned defaults: AQE on
  * (runtime re-plan, skew-join splitting), shuffle partitions sized to
  * the worker count (not the 200 default), UTC for oracle parity,
  * nanos-parquet handling for the events table, and the graft SQL
  * functions registered. */
object GraftSession {
  def build(master: String = "local[*]",
            shufflePartitions: Int = Runtime.getRuntime.availableProcessors(),
            appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftFunctions.register(spark)
    spark
  }
}
