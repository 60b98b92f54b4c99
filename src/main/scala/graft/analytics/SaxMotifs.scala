package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** SAX motif mining — SURVEY.md §2.347.
  *
  * §2.179 produces the per-series SAX word; THE reason the time-series
  * literature symbolizes at all is what comes next: MOTIF discovery
  * (Lin/Keogh — recurring subsequences = operational regimes, weekly
  * rhythms, repeated incident signatures) over the symbol windows.
  * This op slides a [[MotifW]]-symbol window over each event type's
  * day-ordered SAX sequence and reports each recurring window word
  * (count ≥ 2) with its support — the "what shapes does this metric
  * repeat" table that seeds §2.194-style novelty scoring on series.
  *
  * Scale shape: identical to §2.179 — the ONLY corpus-sized stage is
  * the (type, day) groupBy; symbols, lead-windows, motif counts, and
  * ranks all run on the calendar-bounded aggregate (windows over
  * aggregates — the §2.334 allowance). Determinism: symbols are fixed
  * breakpoint compares (§2.179's chain verbatim); windows assemble via
  * lead() over (day) so executor order is irrelevant; support is one
  * division of exact integers; ties rank on (count DESC, motif ASC). */
object SaxMotifs {

  /** Motif window length (4 symbols ≈ half a business week — long
    * enough to be a shape, short enough to recur). */
  val MotifW = 4
  /** Motifs reported per series. */
  val TopM = 5

  /** §2.347 `sax_motifs`: per event type, the top recurring
    * [[MotifW]]-symbol windows — count, support among windows, rank. */
  def saxMotifs(spark: SparkSession, dir: String): DataFrame = {
    // exact integer-cent series + exact-moment mu/sigma (Sax.dailyCents
    // / Sax.exactStats) — the raw float sum(value) this replaced is
    // partial-order-dependent and flips symbols at SAX cuts (r11 sf1
    // gate class)
    val daily = Sax.dailyCents(spark, dir)
    val stats = Sax.exactStats(daily)
    val (c1, c2, c3) = Sax.Cuts
    val sym = daily
      .join(broadcast(stats), col("event_type") === col("et"))
      .withColumn("z", (col("v") - col("mu")) / col("sigma"))
      .withColumn("sym",
        when(col("z") < c1, "a").when(col("z") < c2, "b")
          .when(col("z") < c3, "c").otherwise("d"))
      .select("event_type", "day", "sym")
    val wd = Window.partitionBy("event_type").orderBy("day")
    val windows = sym
      .withColumn("motif", concat((0 until MotifW).map(i =>
        if (i == 0) col("sym") else lead("sym", i).over(wd)): _*))
      .filter(length(col("motif")) === MotifW) // drop tail partials
    val counts = windows.groupBy("event_type", "motif")
      .agg(count(lit(1)).as("n"))
      .withColumn("n_windows",
        sum("n").over(Window.partitionBy("event_type")))
    counts.filter(col("n") >= 2)
      .withColumn("rk", row_number().over(Window.partitionBy("event_type")
        .orderBy(desc("n"), asc("motif"))))
      .filter(col("rk") <= TopM)
      .select(col("event_type"), col("rk"), col("motif"), col("n"),
        round(col("n").cast("double") / col("n_windows"), 6).as("support"))
      .orderBy("event_type", "rk")
  }

  val saxMotifsSql: String = {
    val (c1, c2, c3) = Sax.Cuts
    val leads = (1 until MotifW).map(i =>
      s"lead(sym, $i) OVER (PARTITION BY event_type ORDER BY day)")
      .mkString(", ")
    s"""WITH daily AS (${Sax.dailyCentsSql}),
       |stats AS (${Sax.exactStatsSql}),
       |sym AS (SELECT d.event_type, d.day,
       |    CASE WHEN (v - mu) / sigma < $c1 THEN 'a'
       |         WHEN (v - mu) / sigma < $c2 THEN 'b'
       |         WHEN (v - mu) / sigma < $c3 THEN 'c'
       |         ELSE 'd' END AS sym
       |  FROM daily d JOIN stats s ON d.event_type = s.event_type),
       |win AS (SELECT event_type,
       |    concat(sym, $leads) AS motif
       |  FROM sym),
       |full_w AS (SELECT * FROM win WHERE length(motif) = $MotifW),
       |cnt AS (SELECT event_type, motif, count(*) AS n,
       |    CAST(sum(count(*)) OVER (PARTITION BY event_type) AS BIGINT)
       |      AS n_windows
       |  FROM full_w GROUP BY 1, 2)
       |SELECT event_type, rk, motif, n,
       |  round(CAST(n AS DOUBLE) / n_windows, 6) AS support
       |FROM (SELECT *, row_number() OVER (PARTITION BY event_type
       |    ORDER BY n DESC, motif ASC) AS rk
       |  FROM cnt WHERE n >= 2) t
       |WHERE rk <= $TopM ORDER BY event_type, rk""".stripMargin
  }
}
