package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.Streaming

class StreamJoinSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  test("watermarked stream-stream join matches the batch twin") {
    val q = Streaming.streamStreamJoin(Streaming.readEventsStream(spark, sf))
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj").start()
    q.processAllAvailable(); q.stop()
    val stream = spark.table("ssj")
    val batch = Streaming.streamStreamJoinBatch(spark, sf)
    assert(stream.count() == batch.count())
    val sAgg = stream.agg(sum("p_id"), sum("c_id")).head()
    val bAgg = batch.agg(sum("p_id"), sum("c_id")).head()
    assert(sAgg == bAgg)
  }

  test("foreachBatch upsert sink merges micro-batches by key") {
    val base = java.nio.file.Files.createTempDirectory("graft-fb").toString
    val srcDir = s"$base/src"
    // two source files → two micro-batches (maxFilesPerTrigger=1)
    val ev = Tables.events(spark, sf)
    ev.filter(col("event_id") % 2 === 0).coalesce(1)
      .write.parquet(s"$srcDir/f0")
    ev.filter(col("event_id") % 2 === 1).coalesce(1)
      .write.parquet(s"$srcDir/f1")
    val schema = ev.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
    val target = s"$base/target"
    val q = Streaming.foreachBatchUpsert(stream, target, s"$base/ckpt")
    q.processAllAvailable(); q.stop()
    val got = spark.read.parquet(target)
    assert(got.select("event_id").distinct().count() == ev.count())
    assert(got.count() == ev.count())
  }
}
