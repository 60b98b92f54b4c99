package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.{Bronze, Medallion}
import graft.tools.GenData
import graft.tools.GenData.TrackFault

/** DQ/quarantine/gate against GENERATED dirty data at spec scale
  * (20 k rows, ~5% fault rate) — until now these paths only ever saw
  * 5-row hand fixtures. Every fault is a pure function of the row id
  * (GenData.trackFault), so expected counts and the exact offending
  * keys are re-derived here and asserted to the row. */
class MedallionDirtySpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val n = 20000L
  private val ts = java.sql.Timestamp.valueOf("2026-02-01 00:00:00")
  private lazy val dirty = GenData.dirtyTracks(spark, n).cache()

  // re-derive the planted faults from the pure function
  private lazy val faults: Map[Long, TrackFault.Value] =
    (0L until n).map(id => id -> GenData.trackFault(id)).toMap
  private def idsOf(f: TrackFault.Value): Set[Long] =
    faults.collect { case (id, g) if g == f => id }.toSet
  private def trackId(id: Long): String = f"tr$id%08d"

  test("bronze DQ counts equal the planted fault counts, to the row") {
    val r = Medallion.run(dirty, "GEN", "dirty_b1", ts, "index")
    val br = r.bronzeReport.collect()
      .map(x => (x.getString(0) + "/" + x.getString(1), x)).toMap
    def violations(k: String) = br(k).getAs[Long]("violations")

    assert(violations("not_null/track_id") == idsOf(TrackFault.NullTrackId).size)
    assert(violations("not_null/artists") == idsOf(TrackFault.NullArtists).size)
    assert(violations("not_null/track_name") == idsOf(TrackFault.NullTrackName).size)
    assert(violations("between/danceability") == idsOf(TrackFault.DanceOutOfRange).size)
    assert(violations("between/loudness") == idsOf(TrackFault.LoudnessOutOfRange).size)
    // rates are small but the planted classes must actually be present
    assert(Seq("not_null/track_id", "between/danceability", "between/loudness")
      .forall(violations(_) > 0))

    // sample_keys point at genuinely planted rows
    val danceKeys = br("between/danceability").getAs[String]("sample_keys")
      .split(",").toSet
    val planted = idsOf(TrackFault.DanceOutOfRange).map(trackId)
    assert(danceKeys.nonEmpty && danceKeys.subsetOf(planted),
      s"sample_keys $danceKeys not within planted $planted")
  }

  test("gate=true aborts on the generated dirty batch") {
    val e = intercept[IllegalStateException] {
      Medallion.run(dirty, "GEN", "dirty_b2", ts, "index", gate = true)
    }
    assert(e.getMessage.contains("[bronze]"))
  }

  test("dropping the bronze-red rows makes the full gated pipeline pass") {
    val redFaults: Set[TrackFault.Value] = Set(TrackFault.NullTrackId,
      TrackFault.NullArtists, TrackFault.NullTrackName,
      TrackFault.DanceOutOfRange, TrackFault.LoudnessOutOfRange)
    val badIds = faults.collect { case (id, f) if redFaults(f) => id }.toSeq
    val cleaned = dirty.filter(!col("index").isin(badIds: _*))
    // clamp absorbs popularity>100, imputation fills popularity nulls,
    // keep-first dedup absorbs the duplicate track_ids -> silver green
    val r = Medallion.run(cleaned, "GEN", "dirty_b3", ts, "index", gate = true)
    // a dup row collides only when its source row survived the drop AND
    // still carries its own id (a DupTrackId source renamed itself away)
    val dups = idsOf(TrackFault.DupTrackId).count(id =>
      !badIds.contains(id - 1) && faults(id - 1) != TrackFault.DupTrackId)
    assert(r.silver.count() == n - badIds.size - dups)
  }

  test("quarantine splits the generated corrupt CSV exactly") {
    import org.apache.spark.sql.types._
    val m = 5000L
    val dir = java.nio.file.Files.createTempDirectory("graft-dirty-csv").toString
    GenData.writeDirtyTracksCsv(spark, s"$dir/tracks", m)
    val schema = StructType(Seq(
      StructField("index", LongType), StructField("track_id", StringType),
      StructField("artists", StringType), StructField("album_name", StringType),
      StructField("track_name", StringType), StructField("popularity", DoubleType),
      StructField("duration_ms", DoubleType), StructField("danceability", DoubleType),
      StructField("energy", DoubleType), StructField("loudness", DoubleType),
      StructField("tempo", DoubleType), StructField("track_genre", StringType)))
    val (ok, bad) = Bronze.quarantine(
      Bronze.readCsvPermissive(spark, s"$dir/tracks", schema))
    val expected = (0L until m).count(GenData.isCsvCorrupt)
    assert(expected > 0)
    assert(bad.count() == expected, s"want $expected corrupt rows")
    assert(ok.count() == m - expected)
    // corrupt rows carry the raw line for forensics
    assert(bad.head().getAs[String](Bronze.CorruptCol).contains("NOT_A_NUMBER"))
  }
}
