package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.Streaming

/** §2.319 incremental gold-layer maintenance: the foreachBatch-merged
  * rollup must equal the batch recompute (goldRollup's definition)
  * after every micro-batch prefix, survive a query RESTART from the
  * checkpoint without reprocessing, and ignore a REPLAYED batch (the
  * exactly-once fence). */
class GoldIncrementalSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  private def rollupOf(events: org.apache.spark.sql.DataFrame) =
    events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("value_cents"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getLong(2), r.getLong(3))).toSeq.sorted

  private def goldOf(goldDir: String) =
    spark.read.parquet(goldDir)
      .select("event_type", "day", "n_events", "value_cents")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getLong(2), r.getLong(3))).toSeq.sorted

  test("gold table equals batch recompute after each prefix, across restart, " +
       "and under a replayed batch") {
    val base = java.nio.file.Files.createTempDirectory("graft-gold").toString
    val srcDir = s"$base/src"
    val goldDir = s"$base/gold"
    val ckpt = s"$base/ckpt"
    val ev = Tables.events(spark, sf)
    // three source files → three micro-batches (maxFilesPerTrigger=1)
    for (i <- 0 to 2)
      ev.filter(col("event_id") % 4 === i).coalesce(1)
        .write.parquet(s"$srcDir/f$i")
    def stream() = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
    val q = Streaming.goldIncrementalStream(stream(), goldDir, ckpt)
    q.processAllAvailable(); q.stop()
    val fed3 = ev.filter(col("event_id") % 4 <= 2)
    assert(goldOf(goldDir) == rollupOf(fed3),
      "gold after 3 micro-batches != batch recompute")

    // restart from the checkpoint with a 4th file: ONLY the new file
    // is processed (checkpointed offsets), table ends at the full corpus
    ev.filter(col("event_id") % 4 === 3).coalesce(1)
      .write.parquet(s"$srcDir/f3")
    val q2 = Streaming.goldIncrementalStream(stream(), goldDir, ckpt)
    q2.processAllAvailable(); q2.stop()
    assert(goldOf(goldDir) == rollupOf(ev),
      "gold after restart+catchup != full batch recompute")
    val wm = spark.read.parquet(goldDir)
      .agg(max("_last_batch")).head().getLong(0)

    // replay fence: re-merging an already-applied batchId is a no-op
    val before = goldOf(goldDir)
    Streaming.mergeGoldBatch(ev.filter(col("event_id") % 4 === 0).toDF(),
      wm, goldDir)
    assert(goldOf(goldDir) == before, "replayed batch double-counted")
    // and a genuinely new batch id still merges
    Streaming.mergeGoldBatch(
      ev.filter(col("event_id") % 4 === 0).limit(0).toDF(), wm + 1, goldDir)
    assert(goldOf(goldDir) == before, "empty new batch changed values")
    assert(spark.read.parquet(goldDir)
      .agg(max("_last_batch")).head().getLong(0) == wm + 1)
  }

  test("zero-row gold table (empty first batch) does not NPE the merge " +
       "and the next real batch still lands") {
    val base = java.nio.file.Files.createTempDirectory("graft-gold3").toString
    val goldDir = s"$base/gold"
    val ev = Tables.events(spark, sf)
    // batch 0 is empty → gold table exists with ZERO rows, so
    // max(_last_batch) is NULL; pre-fix this threw NPE on the next merge
    Streaming.mergeGoldBatch(ev.limit(0).toDF(), 0L, goldDir)
    assert(spark.read.parquet(goldDir).count() == 0L)
    Streaming.mergeGoldBatch(ev.toDF(), 1L, goldDir)
    assert(goldOf(goldDir) == rollupOf(ev),
      "merge after empty first batch != batch recompute")
    assert(spark.read.parquet(goldDir)
      .agg(max("_last_batch")).head().getLong(0) == 1L)
  }

  test("interrupted swap (table only at _old) is restored on the next " +
       "merge instead of history being discarded") {
    val base = java.nio.file.Files.createTempDirectory("graft-gold4").toString
    val goldDir = s"$base/gold"
    val ev = Tables.events(spark, sf)
    val half = ev.filter(col("event_id") % 2 === 0)
    Streaming.mergeGoldBatch(half.toDF(), 0L, goldDir)
    // simulate a crash between target.renameTo(bak) and
    // tmp.renameTo(target): the table exists ONLY at goldDir_old
    assert(new java.io.File(goldDir).renameTo(
      new java.io.File(goldDir + "_old")))
    // pre-fix, this merge rebuilt gold from the delta alone (dropping
    // batch 0's history) and deleted _old; post-fix it restores _old
    // first, so the result equals the full-corpus recompute
    Streaming.mergeGoldBatch(
      ev.filter(col("event_id") % 2 =!= 0).toDF(), 1L, goldDir)
    assert(goldOf(goldDir) == rollupOf(ev),
      "history from before the interrupted swap was discarded")
    assert(!new java.io.File(goldDir + "_old").exists())
  }

  test("gold_rollup oracle twin matches readGold after full maintenance") {
    val base = java.nio.file.Files.createTempDirectory("graft-gold2").toString
    val ev = Tables.events(spark, sf)
    Streaming.mergeGoldBatch(ev.toDF(), 0L, s"$base/gold")
    val got = Streaming.readGold(spark, s"$base/gold")
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    val want = graft.etl.EtlQueries.goldRollup(spark, sf)
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    assert(got == want)
  }
}
