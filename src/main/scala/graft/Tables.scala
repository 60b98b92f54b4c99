package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry for the driver-generated test corpus (TESTDATA.md).
  *
  * Every query receives an `sfDir` (e.g. `/root/testdata/sf0.01`) and
  * loads parquet from it. At production scale the same API points at a
  * 100 TB lake path; parquet scans get Catalyst filter/column pushdown
  * for free, so all operators select/filter *before* any shuffle.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** The driver's events.parquet stores `ts` as TIMESTAMP(NANOS), which
    * Spark's vectorized parquet reader rejects; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` so it arrives as
    * nanos-since-epoch LongType, converted here to a microsecond
    * TIMESTAMP (floor, matching DuckDB's ns→us truncation). Generated
    * scale-up data (tools/GenData) writes `ts` as an ordinary
    * TIMESTAMP(MICROS) column — already what the nanos path converges
    * to — so the conversion is keyed on the physical type. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
