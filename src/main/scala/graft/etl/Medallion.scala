package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dq._

/** End-to-end medallion pipeline — the reference's two DAGs
  * (csv_to_mysql_etl + de_spotify_silver) as one composable run.
  *
  * Mirrors /root/reference/dags/de_spotify_to_bronze.py +
  * de_spotify_silver.py + sql/de_spotify_silver.sql over the
  * reference's actual spotify_tracks schema:
  *   bronze  = raw read → lineage metadata → DQ suite → parquet
  *   silver  = medians/modes (from full bronze, like the reference's
  *             compute_medians_modes) → dedup keep-first on track_id →
  *             COALESCE impute → LEAST/GREATEST clamp → DQ suite → parquet
  *
  * Differences from the reference, by design: stats/validation run as
  * single distributed passes (no pandas round-trip, no per-expectation
  * queries), and the sink is parquet (columnar lake) instead of MySQL.
  */
object Medallion {

  val numericCols: Seq[String] = Seq(
    "popularity", "duration_ms", "danceability", "energy", "loudness",
    "speechiness", "acousticness", "instrumentalness", "liveness",
    "valence", "tempo")

  val categoricalCols: Seq[String] = Seq(
    "artists", "album_name", "track_name", "track_genre")

  /** Clamp bounds from de_spotify_silver.sql (LEAST/GREATEST pairs). */
  val clampBounds: Map[String, (Double, Double)] = Map(
    "popularity" -> (0.0, 100.0), "danceability" -> (0.0, 1.0),
    "energy" -> (0.0, 1.0), "speechiness" -> (0.0, 1.0),
    "acousticness" -> (0.0, 1.0), "instrumentalness" -> (0.0, 1.0),
    "liveness" -> (0.0, 1.0), "valence" -> (0.0, 1.0))

  /** Bronze GX suite (de_spotify_to_bronze.py:233-333). */
  def bronzeSuite(keyCols: Seq[String]): Seq[Expectation] =
    keyCols.map(NotNull.apply) ++ Seq(
      RowCountAtLeast(1),
      Between("danceability", 0.0, 1.0),
      Between("acousticness", 0.0, 1.0),
      Between("instrumentalness", 0.0, 1.0),
      Between("loudness", -60.0, 0.0))

  /** Silver GX suite (de_spotify_silver.py:96-204). */
  def silverSuite: Seq[Expectation] = Seq(
    Unique("track_id"), RowCountAtLeast(1),
    NotNull("track_id"), NotNull("artists"), NotNull("track_name"),
    Between("popularity", 0.0, 100.0), Between("danceability", 0.0, 1.0),
    Between("energy", 0.0, 1.0), Between("tempo", 0.0, Double.MaxValue),
    Between("loudness", -60.0, 0.0))

  final case class Result(bronze: DataFrame, bronzeReport: DataFrame,
      silver: DataFrame, silverReport: DataFrame)

  /** Run the full pipeline on a raw tracks DataFrame. `orderCol` is the
    * reference's `index` column (dedup keep-first ordering).
    *
    * `gate = true` mirrors the reference DAG's control flow: a failing
    * GX suite aborts the task (de_spotify_to_bronze.py validation
    * callback) — here [[Expectations.requireAllPassed]] throws on the
    * first red report, bronze before silver is ever computed. */
  def run(raw: DataFrame, source: String, batchId: String,
      ingestionTs: java.sql.Timestamp, orderCol: String,
      outDir: Option[String] = None, gate: Boolean = false): Result = {

    // ---- bronze ----
    // keep only expectations whose columns exist (schema drift safety)
    def applicable(s: Seq[Expectation], df: DataFrame): Seq[Expectation] =
      s.filter(e => e.column == "*" ||
        e.column.split("\\+").forall(df.columns.contains))

    val bronze = Bronze.withMetadata(raw, source, batchId, ingestionTs)
    val bronzeReport = Expectations.run(bronze,
      applicable(bronzeSuite(Seq("track_id", "track_name", "artists")), bronze),
      sampleKey = if (bronze.columns.contains("track_id")) Some("track_id") else None)
    if (gate) Expectations.requireAllPassed(bronzeReport, "bronze")
    outDir.foreach(d => Loader.write(bronze, s"$d/bronze", "full"))

    // ---- silver: stats from the FULL bronze table (reference order) ----
    val med = Silver.medians(bronze, numericCols.filter(c =>
      bronze.columns.contains(c)))
    val mod = Silver.modes(bronze, categoricalCols.filter(c =>
      bronze.columns.contains(c)))

    val deduped = Silver.dedupKeepFirst(bronze, Seq("track_id"),
      orderCol +: bronze.columns.filterNot(_ == "track_id").toSeq)
    val imputed = Silver.impute(deduped, (med: Map[String, Any]) ++ mod)
    val clamped = clampBounds.foldLeft(imputed) { case (df, (c, (lo, hi))) =>
      if (df.columns.contains(c)) df.withColumn(c, Silver.clamp(col(c), lo, hi))
      else df
    }
    val silverReport = Expectations.run(clamped, applicable(silverSuite, clamped),
      sampleKey = if (clamped.columns.contains("track_id")) Some("track_id") else None)
    if (gate) Expectations.requireAllPassed(silverReport, "silver")
    outDir.foreach(d => Loader.write(clamped, s"$d/silver", "full"))

    Result(bronze, bronzeReport, clamped, silverReport)
  }
}
