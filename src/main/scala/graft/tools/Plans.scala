package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dumps plans for every SparkEntry query → PLANS.md, the artifact
  * behind the plan-quality audit in SURVEY §6.
  *
  * Two modes:
  *  - static (default): `explain("formatted")` of the compiled plan —
  *    fast, no execution, what rounds 1–4 audited.
  *  - `executed`: materialize each query first, then dump the FINAL
  *    adaptive plan. Plan shapes asserted from tiny inputs hide what
  *    AQE does with real statistics — broadcast→SMJ flips, partition
  *    coalescing, skew-join splitting only appear at runtime — so the
  *    sf1 audit must read the executed plan, not the compiled one.
  *
  * Usage: runMain graft.tools.Plans [dir] [out] [executed] [only=<substr>]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "PLANS.md"
    val executed = args.contains("executed")
    val spark: SparkSession =
      if (executed) // the bench config: AQE on, scale-sized shuffle parallelism
        graft.GraftSession.build("local[32]", "graft-plans",
          dataDir = Some(dir), cores = 32)
      else SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    val mode = if (executed) s"EXECUTED adaptive plans, $dir, AQE on"
               else s"explain formatted, $dir, AQE off at plan time"
    sb.append(s"# Physical plans ($mode)\n")
    val only = args.collectFirst { case a if a.startsWith("only=") => a.drop(5) }
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(name.contains) }
      .foreach { case (name, fn) =>
      sb.append(s"\n## $name\n\n```\n")
      try {
        graft.Caches.clearAll() // per-query cost, not memoized reuse
        val df = fn(spark, dir)
        if (executed) {
          // Execute THIS dataframe's physical plan (toRdd = the plan's own
          // execute()); df.count() would build a separate QueryExecution and
          // leave this one's AdaptiveSparkPlan unfinalized (isFinalPlan=false,
          // no runtime broadcast conversions / coalescing / skew splits).
          df.queryExecution.toRdd.count()
          // executedPlan.toString prints the FINAL plan first, then the
          // initial plan section — keep only the final section
          sb.append(df.queryExecution.executedPlan.toString
            .split("== Initial Plan ==")(0))
        } else {
          sb.append(df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        }
      } catch { case e: Throwable => sb.append(s"ERROR: ${e.getMessage}") }
      sb.append("\n```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"[plans] wrote $out")
    spark.stop()
  }
}
