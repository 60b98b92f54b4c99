package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.Medallion

/** End-to-end pipeline over the REFERENCE's spotify_tracks schema:
  * dirty input (nulls, dupes, out-of-range values) → bronze → silver,
  * asserting each cleansing step the reference performs. */
class MedallionSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def dirtyTracks = Seq(
    // (index, track_id, artists, album_name, track_name, popularity,
    //  duration_ms, danceability, energy, loudness, tempo, track_genre)
    (0, "t1", "artist-a", "alb1", "song1", 150.0, 200000.0, 0.5, 0.6, -5.0, 120.0, "rock"),
    (1, "t1", "artist-dupe", "alb1", "song1-dupe", 10.0, 200000.0, 0.5, 0.6, -5.0, 120.0, "rock"),
    (2, "t2", null, "alb2", "song2", 50.0, 180000.0, 1.7, 0.4, -80.0, 90.0, "jazz"),
    (3, "t3", "artist-b", "alb3", "song3", Double.NaN, 210000.0, 0.7, 0.2, -12.0, 140.0, null),
    (4, "t4", "artist-a", "alb4", "song4", 30.0, 240000.0, 0.4, 0.9, -3.0, 100.0, "rock"))
    .toDF("index", "track_id", "artists", "album_name", "track_name",
      "popularity", "duration_ms", "danceability", "energy", "loudness",
      "tempo", "track_genre")
    .withColumn("popularity", when(isnan(col("popularity")), lit(null)).otherwise(col("popularity")))

  test("pipeline dedups, imputes, and clamps like the reference silver SQL") {
    val r = Medallion.run(dirtyTracks, "CSV", "batch_test",
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), "index")

    // lineage metadata present
    assert(r.bronze.columns.contains("batch_identifier"))

    // bronze DQ caught the injected problems
    val br = r.bronzeReport.collect()
      .map(x => (x.getString(0) + "/" + x.getString(1), x.getLong(2))).toMap
    assert(br("not_null/artists") == 1)       // t2's null artist
    assert(br("between/danceability") == 1)   // 1.7
    assert(br("between/loudness") == 1)       // -80

    val silver = r.silver.orderBy("track_id").collect()
      .map(x => x.getAs[String]("track_id") -> x).toMap

    // dedup keep-first by index: t1 kept row index 0
    assert(silver.size == 4)
    assert(silver("t1").getAs[String]("artists") == "artist-a")

    // imputation: t3's null popularity → median of (150? clamped later) —
    // medians from FULL bronze incl. dupes: [150,10,50,30] → 40.0
    assert(silver("t3").getAs[Double]("popularity") == 40.0)
    // t3's null genre → mode ("rock"), t2's null artist → mode ("artist-a")
    assert(silver("t3").getAs[String]("track_genre") == "rock")
    assert(silver("t2").getAs[String]("artists") == "artist-a")

    // clamping: popularity 150 → 100, danceability 1.7 → 1.0
    assert(silver("t1").getAs[Double]("popularity") == 100.0)
    assert(silver("t2").getAs[Double]("danceability") == 1.0)

    // silver DQ: track_id now unique; ranges hold except loudness (-80
    // has no clamp in the reference SQL → still flagged)
    val sr = r.silverReport.collect()
      .map(x => (x.getString(0) + "/" + x.getString(1), x.getLong(2))).toMap
    assert(sr("unique/track_id") == 0)
    assert(sr("between/popularity") == 0)
    assert(sr("between/danceability") == 0)
  }

  test("DQ reports carry failing-row sample keys (partial_unexpected_list)") {
    val r = Medallion.run(dirtyTracks, "CSV", "batch_test",
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), "index")
    val br = r.bronzeReport.collect()
      .map(x => (x.getString(0) + "/" + x.getString(1),
        x.getAs[String]("sample_keys"))).toMap
    assert(br("not_null/artists") == "t2")
    assert(br("between/danceability") == "t2")
    assert(br("between/loudness") == "t2")
  }

  test("gate=true mirrors the reference DAG: red bronze suite aborts the run") {
    val e = intercept[IllegalStateException] {
      Medallion.run(dirtyTracks, "CSV", "batch_test",
        java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), "index", gate = true)
    }
    assert(e.getMessage.contains("[bronze]"))
    assert(e.getMessage.contains("not_null(artists)"))
  }

  test("gate=true passes a clean batch end-to-end") {
    import spark.implicits._
    val clean = Seq(
      (0, "t1", "artist-a", "alb1", "song1", 50.0, 200000.0, 0.5, 0.6, -5.0, 120.0, "rock"),
      (1, "t2", "artist-b", "alb2", "song2", 60.0, 180000.0, 0.7, 0.4, -8.0, 90.0, "jazz"))
      .toDF("index", "track_id", "artists", "album_name", "track_name",
        "popularity", "duration_ms", "danceability", "energy", "loudness",
        "tempo", "track_genre")
    val r = Medallion.run(clean, "CSV", "batch_clean",
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), "index", gate = true)
    assert(r.silver.count() == 2)
  }

  test("pipeline writes bronze and silver sinks when outDir given") {
    val out = java.nio.file.Files.createTempDirectory("graft-med").toString
    Medallion.run(dirtyTracks, "CSV", "b1",
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), "index", Some(out))
    assert(spark.read.parquet(s"$out/bronze").count() == 5)
    assert(spark.read.parquet(s"$out/silver").count() == 4)
  }
}
