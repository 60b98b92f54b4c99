package graft.tools

import org.apache.spark.sql.functions._

/** Micro-probe (dev tool): does a lazy localCheckpoint actually reuse
  * its blocks across separate downstream actions, or does each action
  * recompute the lineage? Round-14 triage for the vecsD reuse claim. */
object CkptProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build("local[32]", "graft-ckpt-probe",
      dataDir = Some(dir), cores = 32)
    spark.sparkContext.setLogLevel("WARN")
    val coll = new ProfileStages.Collector
    spark.sparkContext.addSparkListener(coll)
    val v = graft.ann.Ivf.vecsD(
      graft.Tables.load(spark, dir, "embeddings")).localCheckpoint(eager = false)
    (1 to 3).foreach { i =>
      coll.clear()
      val n = v.agg(sum("vec_id")).collect()(0)
      Thread.sleep(300)
      println(s"action $i -> $n")
      coll.report()
    }
    println("rdd storage: " + spark.sparkContext.getPersistentRDDs.map {
      case (id, rdd) => s"$id:${rdd.getStorageLevel.description}"
    }.mkString(", "))
    spark.stop()
  }
}
