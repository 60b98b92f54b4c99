package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** The dump loop, separated from `main` so the loud-failure contract
    * is spec-testable (VerifyGateSpec): every selected query either
    * writes `outDir/<name>/` or lands in the returned failure list AND
    * `outDir/verify_failures.json` — a throwing query can never just
    * vanish from the driver's compare (the round-5 silent-shrink hole).
    * Returns failures in run order as (name, "Class: message"). */
  def run(spark: SparkSession, sfDir: String, outDir: String,
      queries: Map[String, (SparkSession, String) => DataFrame],
      oracleSql: Map[String, String]): List[(String, String)] = {
    new java.io.File(outDir).mkdirs()
    var failures = List.empty[(String, String)]
    queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failures ::= (name, s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val ordered = failures.reverse
    val failJson = ordered
      .map { case (k, m) => s"${q(k)}: ${q(m)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_failures.json"), failJson)
    if (ordered.nonEmpty)
      // denominator = the set actually run, not the registry size —
      // under SPARK_GRAFT_ONLY the registry count misstates coverage
      System.err.println(s"VERIFY INCOMPLETE: ${ordered.size} of " +
        s"${queries.size} queries failed: ${ordered.map(_._1).mkString(",")}")
    ordered
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // single config point: tuned defaults + the §5 shuffle-sizing rule
    val spark = GraftSession.build(s"local[$cpus]", "graft-verify",
      dataDir = Some(sfDir), cores = cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    // dev convenience: SPARK_GRAFT_ONLY=a,b,c dumps a subset (the
    // driver never sets it, so its gate always runs everything)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    run(spark, sfDir, outDir,
      SparkEntry.queries.filter { case (name, _) => only.forall(_.contains(name)) },
      SparkEntry.oracleSql)
    spark.stop()
  }
}
