package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 triage harness for the one un-root-caused sf5 mover
  * (`dedup_exact`, VERDICT r9 §6 item 1): times bisecting variants of
  * the query under a per-stage CPU listener (the r9 protocol — stage
  * executorRunTime/CpuTime beats wall-clock bisection). Variants pin
  * which phase carries the cost: the md5 scan, the content_hash
  * groupBy, the join-back, or the window reformulation. Every variant
  * forces real column evaluation through an agg on the computed
  * values (the r9 `count()`-pruning trap).
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.TriageDedupExact [reps]
  */
object TriageDedupExact {

  private class StageCpu extends SparkListener {
    var runMs = 0L; var cpuMs = 0L; var stages = 0
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      runMs += sc.stageInfo.taskMetrics.executorRunTime
      cpuMs += sc.stageInfo.taskMetrics.executorCpuTime / 1000000L
      stages += 1
    }
    def reset(): Unit = { runMs = 0; cpuMs = 0; stages = 0 }
  }

  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata/sf5")
    val spark = graft.GraftSession.build("local[32]", "graft-triage",
      dataDir = Some(dir), cores = 32)
    spark.sparkContext.setLogLevel("WARN")
    val listener = new StageCpu
    spark.sparkContext.addSparkListener(listener)
    import graft.text.TextFunctions.{hash64, normalize}

    def docs = graft.Tables.documents(spark, dir)
    def hashed = docs.select(col("doc_id"),
      hash64(normalize(col("text"))).as("content_hash"))

    val variants: Seq[(String, () => Long)] = Seq(
      "read_only" -> (() =>
        docs.agg(sum(length(col("text")))).head().getLong(0)),
      "norm_rep8" -> (() =>
        docs.repartition(8).agg(sum(length(normalize(col("text")))))
          .head().getLong(0)),
      "norm_rep64" -> (() =>
        docs.repartition(64).agg(sum(length(normalize(col("text")))))
          .head().getLong(0)),
      "norm_sf1_same_jvm" -> (() =>
        spark.read.parquet("/root/repo/testdata/sf1/documents.parquet")
          .agg(sum(length(normalize(col("text"))))).head().getLong(0)),
      "norm_only" -> (() =>
        docs.agg(sum(length(normalize(col("text"))))).head().getLong(0)),
      "md5_only" -> (() =>
        docs.agg(sum(length(md5(col("text"))))).head().getLong(0)),
      "conv_only" -> (() =>
        docs.agg(sum(conv(substring(md5(col("text")), 1, 15), 16, 10)
          .cast("long") % 1000003L)).head().getLong(0)),
      "full_bench_shape" -> (() =>
        graft.dedup.Dedup.exactDedup(docs).count()),
      "scan_only" -> (() =>
        hashed.agg(sum(col("content_hash") % 1000003L)).head().getLong(0)),
      "scan_plus_groupby" -> (() =>
        hashed.groupBy("content_hash")
          .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("group_size"))
          .agg(sum(col("canonical_id") * col("group_size"))).head().getLong(0)),
      "full_forced_values" -> (() => {
        val h = hashed
        val canon = h.groupBy("content_hash")
          .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("group_size"))
        h.join(canon, "content_hash")
          .agg(sum(col("canonical_id") * col("group_size"))).head().getLong(0)
      }),
      "window_formulation" -> (() => {
        val w = org.apache.spark.sql.expressions.Window.partitionBy("content_hash")
        hashed
          .withColumn("canonical_id", min("doc_id").over(w))
          .withColumn("group_size", count(lit(1)).over(w))
          .agg(sum(col("canonical_id") * col("group_size"))).head().getLong(0)
      }),
      "full_with_sort_collect" -> (() =>
        graft.dedup.Dedup.exactDedup(docs).collect().length.toLong))

    // session warmup off the books
    graft.Tables.names.foreach(n => graft.Tables.load(spark, dir, n).count())
    for ((name, fn) <- variants) {
      val times = (1 to reps).map { _ =>
        listener.reset()
        val t0 = System.nanoTime()
        fn()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let the listener bus drain stage events
        (wall, listener.runMs, listener.cpuMs, listener.stages)
      }
      val med = times.sortBy(_._1).apply(times.size / 2)
      println(f"[triage] $name%-22s wall=${med._1}%7.2f s  stageRun=${med._2 / 1000.0}%8.1f s  stageCpu=${med._3 / 1000.0}%8.1f s  stages=${med._4}")
    }
    spark.stop()
  }
}
