package graft.tools

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Stage-level profiler (dev tool, guide §1: measure first). The UI is
  * disabled in this sandbox, so this listener captures what the Stages
  * tab would show: per stage — wall span, Σ task run time, task count,
  * GC, shuffle read/write bytes — plus the per-query job count. The
  * "where does the wall clock go" answer for the anti-scaling cluster
  * (many-tiny-stage chains): a query whose Σ-task-time ≪ wall×cores is
  * latency-bound (stage/job scheduling), not work-bound.
  *
  * Usage: runMain graft.tools.ProfileStages <query> [reps]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32).
  */
object ProfileStages {

  final class Collector extends SparkListener {
    case class St(var name: String = "", var nTasks: Int = 0,
      var taskMs: Long = 0, var gcMs: Long = 0,
      var shufReadB: Long = 0, var shufWriteB: Long = 0,
      var inputB: Long = 0, var submitted: Long = 0, var completed: Long = 0)
    val stages = mutable.LinkedHashMap.empty[Int, St]
    var jobs = 0
    override def onJobStart(j: SparkListenerJobStart): Unit = synchronized { jobs += 1 }
    override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = synchronized {
      val s = stages.getOrElseUpdate(e.stageInfo.stageId, St())
      s.name = e.stageInfo.name.takeWhile(_ != '\n').take(60)
      s.submitted = System.currentTimeMillis()
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = synchronized {
      val s = stages.getOrElseUpdate(e.stageInfo.stageId, St())
      s.completed = System.currentTimeMillis()
      s.nTasks = e.stageInfo.numTasks
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
      val s = stages.getOrElseUpdate(e.stageId, St())
      val m = e.taskMetrics
      if (m != null) {
        s.taskMs += m.executorRunTime
        s.gcMs += m.jvmGCTime
        s.shufReadB += m.shuffleReadMetrics.totalBytesRead
        s.shufWriteB += m.shuffleWriteMetrics.bytesWritten
        s.inputB += m.inputMetrics.bytesRead
      }
    }
    def clear(): Unit = synchronized { stages.clear(); jobs = 0 }
    def report(): Unit = synchronized {
      println(f"  ${"stage"}%5s ${"tasks"}%5s ${"wall_ms"}%8s ${"taskSum_ms"}%10s ${"gc_ms"}%6s ${"shufR_kb"}%9s ${"shufW_kb"}%9s ${"in_kb"}%9s  name")
      var wall = 0L; var task = 0L
      stages.toSeq.sortBy(_._1).foreach { case (id, s) =>
        val w = math.max(0, s.completed - s.submitted)
        wall += w; task += s.taskMs
        println(f"  $id%5d ${s.nTasks}%5d $w%8d ${s.taskMs}%10d ${s.gcMs}%6d ${s.shufReadB / 1024}%9d ${s.shufWriteB / 1024}%9d ${s.inputB / 1024}%9d  ${s.name}")
      }
      println(f"  TOTAL jobs=$jobs stages=${stages.size} stageWallSum=${wall}ms taskSum=${task}ms")
    }
  }

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.build(s"local[$cpus]", "graft-profile-stages",
      dataDir = Some(dir), cores = cpus)
    spark.sparkContext.setLogLevel("WARN")
    val coll = new Collector
    spark.sparkContext.addSparkListener(coll)
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { r =>
      graft.Caches.clearAll()
      coll.clear()
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener bus is async; give it a beat to drain before reporting
      Thread.sleep(300)
      println(f"[stages] $name rep$r $sec%7.2f s  ($n rows, cpus=$cpus)")
      coll.report()
    }
    spark.stop()
  }
}
