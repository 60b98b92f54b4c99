package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SAX symbolization of daily metric series — SURVEY.md §2 item 179.
  *
  * Symbolic Aggregate approXimation (Lin et al., DMKD'07): each
  * event_type's daily value-sum series is z-normalized against its own
  * mean/std and discretized into a 4-letter alphabet at the N(0,1)
  * quartile breakpoints (−0.6745, 0, 0.6745); the per-series symbol
  * string is the shape fingerprint that motif/novelty mining indexes.
  *
  * Scale shape: one map-side-combined groupBy to the (type, day) grain
  * — the only corpus-sized stage — then per-series moments as a tiny
  * second aggregate broadcast back (no unbounded window over the
  * series), and ONE ordered collect_list per series bounded by
  * |days| ≈ 2.4 k. Determinism: symbols depend on z only through
  * fixed breakpoint comparisons; the string assembles from an
  * array_sort over (day, sym) structs, so executor order is
  * irrelevant. */
object Sax {

  /** N(0,1) quartile breakpoints for the 4-symbol alphabet a<b<c<d. */
  val Cuts: (Double, Double, Double) = (-0.6745, 0.0, 0.6745)

  def saxSymbols(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum("value").as("v"))
    val stats = daily.groupBy(col("event_type").as("et"))
      .agg(avg("v").as("mu"), stddev("v").as("sigma"))
    val sym = daily
      .join(broadcast(stats), col("event_type") === col("et"))
      .withColumn("z", (col("v") - col("mu")) / col("sigma"))
      .withColumn("sym",
        when(col("z") < Cuts._1, "a")
          .when(col("z") < Cuts._2, "b")
          .when(col("z") < Cuts._3, "c")
          .otherwise("d"))
    sym.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        array_join(transform(
          array_sort(collect_list(struct(col("day"), col("sym")))),
          x => x.getField("sym")), "").as("sax_word"))
      .orderBy("event_type")
  }

  val saxSymbolsSql: String = {
    val (c1, c2, c3) = Cuts
    s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
       |    sum(value) AS v FROM events GROUP BY 1, 2),
       |stats AS (SELECT event_type, avg(v) AS mu, stddev(v) AS sigma
       |  FROM daily GROUP BY 1),
       |sym AS (SELECT d.event_type, d.day,
       |    CASE WHEN (v - mu) / sigma < $c1 THEN 'a'
       |         WHEN (v - mu) / sigma < $c2 THEN 'b'
       |         WHEN (v - mu) / sigma < $c3 THEN 'c'
       |         ELSE 'd' END AS sym
       |  FROM daily d JOIN stats s ON d.event_type = s.event_type)
       |SELECT event_type, count(*) AS n_days,
       |  string_agg(sym, '' ORDER BY day) AS sax_word
       |FROM sym GROUP BY event_type ORDER BY event_type""".stripMargin
  }
}
