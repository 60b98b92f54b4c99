package graft.tools

import org.apache.spark.sql.functions._

/** Stage-level accounting for ann_graph (dev tool, the SimhashProbe
  * precedent): times the NN-Descent BUILD and the beam SEARCH
  * separately under the bench session config, so optimization effort
  * lands on the phase that actually owns the wall time.
  * Usage: runMain graft.tools.GraphAnnProbe [reps] */
object GraphAnnProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build("local[32]", "graft-gaprobe",
      dataDir = Some(dir), cores = 32)
    spark.sparkContext.setLogLevel("WARN")
    (1 to reps).foreach { r =>
      val emb = graft.Tables.embeddings(spark, dir)
      val t0 = System.nanoTime()
      val edges = graft.ann.GraphAnn.knnGraph(emb)
        .localCheckpoint() // eager: force the build NOW
      val t1 = System.nanoTime()
      // search over the prebuilt edges via the table conf seam
      edges.createOrReplaceTempView(s"ga_probe_$r")
      spark.conf.set("spark.graft.graph.table", s"ga_probe_$r")
      val n = graft.ann.GraphAnn.graphTopK(emb).count()
      spark.conf.unset("spark.graft.graph.table")
      val t2 = System.nanoTime()
      println(f"[gaprobe] rep$r build ${(t1 - t0) / 1e9}%6.2f s  search ${(t2 - t1) / 1e9}%6.2f s  ($n rows)")
    }
    spark.stop()
  }
}
