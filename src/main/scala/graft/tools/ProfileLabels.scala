package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-10 probe: replays the Bench rep shape for the label-consumer
  * family (clearAll, then the consumers in bench-alphabetical order)
  * and times each, so the "within one rep, consumers share the
  * persisted labels" claim is measured instead of assumed.
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.ProfileLabels
  */
object ProfileLabels {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata/sf1")
    val spark = graft.GraftSession.build("local[32]", "graft-profile-labels",
      dataDir = Some(dir), cores = 32)
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.names.foreach(n => graft.Tables.load(spark, dir, n).count())
    val family = Seq("cluster_size_dist", "dedup_clusters", "dedup_keep_best",
      "host_quality", "make_splits", "quality_dup_bias")
    graft.Caches.clearAll()
    for (name <- family) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"[labels] $name%-20s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($n rows)")
    }
    // second pass WITHOUT clear: pure warm-cache floor
    for (name <- family) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"[labels2] $name%-20s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    // fine-grained bisect of the warm path
    import org.apache.spark.sql.functions._
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[bisect] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    val labels = graft.pipeline.Pipeline.dedupClustersCached(spark, dir)
    t("labels.count")(labels.count())
    t("labels.groupBy.count")(
      labels.groupBy("cluster_id").count().count())
    t("labels.selfjoin")( {
      val sizes = labels.groupBy("cluster_id").agg(count(lit(1)).as("sz"))
      labels.join(sizes, "cluster_id").count()
    })
    t("textQuality.count")(
      graft.text.TextQueries.textQuality(spark, dir).count())
    t("urlFrame.count.forced")(
      graft.text.Urls.urlCanonicalize(spark, dir)
        .agg(sum(length(col("url_canon")))).head())
    t("hq_again")(graft.SparkEntry.queries("host_quality")(spark, dir).count())
    spark.stop()
  }
}
