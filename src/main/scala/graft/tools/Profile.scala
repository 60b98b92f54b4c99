package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.dedup.Dedup

/** Ad-hoc stage profiler for the heavy dedup operators (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }

    import graft.text.TextFunctions
    time("tokenHashes only") {
      docs.select(col("doc_id"), TextFunctions.tokenHashes(col("text")).as("th"))
        .select(sum(expr("aggregate(th, 0L, (a,b) -> a + b)"))).count()
    }
    time("tokens only") {
      docs.select(TextFunctions.tokens(TextFunctions.normalize(col("text"))).as("t"))
        .select(sum(size(col("t")))).count()
    }
    time("polyhash whole text") {
      docs.select(TextFunctions.polyHash(TextFunctions.normalize(col("text"))).as("h"))
        .select(sum(col("h"))).count()
    }
    time("shingleHashes")(Dedup.shingleHashes(docs).count())
    time("shingleHashes+force") {
      Dedup.shingleHashes(docs)
        .select(sum(expr("aggregate(sh, 0L, (a,b) -> a + b)"))).count()
    }
    time("minhash sigs") {
      Dedup.minhashSignatures(Dedup.shingleHashes(docs).repartition(32))
        .select("doc_id", "b0", "b1", "b2", "b3").count()
    }
    time("minhash sigs forced") {
      Dedup.minhashSignatures(Dedup.shingleHashes(docs).repartition(32))
        .agg(sum(col("b0") + col("b1"))).count()
    }
    import graft.text.{TextFunctions => TF}
    time("exact: hash only") {
      docs.select(TF.hash64(TF.normalize(col("text"))).as("h"))
        .agg(sum(col("h"))).count()
    }
    time("exact canon only") {
      docs.select(col("doc_id"), TF.hash64(TF.normalize(col("text"))).as("content_hash"))
        .groupBy("content_hash").agg(min("doc_id").as("canonical_id"), count(lit(1)).as("gs"))
        .count()
    }
    time("exact join no sort") {
      val hashed = docs.select(col("doc_id"), TF.hash64(TF.normalize(col("text"))).as("content_hash"))
      val canon = hashed.groupBy("content_hash").agg(min("doc_id").as("canonical_id"), count(lit(1)).as("gs"))
      hashed.join(canon, "content_hash").count()
    }
    time("exact full")(Dedup.exactDedup(docs).count())
    time("minhash full")(Dedup.minhashPairs(docs).count())
    time("simhash full")(Dedup.simhashPairs(docs).count())
    time("ngram full")(Dedup.ngramJaccardPairs(docs).count())
    spark.stop()
  }
}
