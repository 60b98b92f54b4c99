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

  /** Daily series as EXACT integer cents (the [[Dtw]] convention):
    * a raw float `sum(value)` is partial-order-dependent, and a
    * 1e-13 wobble in a day's value flips its SAX symbol whenever the
    * z-score sits on a cut — the q1_agg float-tie class the r11 sf1
    * gate established. Shared by [[saxSymbols]] and
    * [[SaxMotifs.saxMotifs]]. */
  private[analytics] def dailyCents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("v"))

  /** Per-type mu/sigma from EXACT integer moments (Σv in Long, Σv² in
    * decimal(38,0)): the double arithmetic is then the same short
    * sequence of correctly-rounded ops on identical exact inputs in
    * both engines — unlike stddev()'s order-dependent M2 recurrence.
    * Sample variance (n−1), matching the stddev it replaces. */
  private[analytics] def exactStats(daily: DataFrame): DataFrame = {
    val s1d = col("s1").cast("double")
    val varNum = col("s2").cast("double") - s1d * s1d / col("nd")
    daily.groupBy(col("event_type").as("et"))
      .agg(count(lit(1)).as("nd"), sum("v").as("s1"),
        sum(col("v").cast("decimal(19,0)") * col("v").cast("decimal(19,0)"))
          .as("s2"))
      .select(col("et"),
        (s1d / col("nd")).as("mu"),
        // null (like the stddev this replaces) on n=1 and on zero
        // variance — Spark 4 ANSI errors on double/0, and a z against
        // a null sigma falls through to the 'd' branch in both engines
        when(col("nd") > 1 && varNum > 0.0,
          sqrt(varNum / (col("nd") - 1))).as("sigma"))
  }

  /** The SQL mirror of [[dailyCents]] + [[exactStats]]: (daily, stats)
    * CTE bodies. */
  private[analytics] val dailyCentsSql: String =
    """SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
      |  FROM events GROUP BY 1, 2""".stripMargin
  private[analytics] val exactStatsSql: String =
    """SELECT event_type,
      |    CAST(s1 AS DOUBLE) / nd AS mu,
      |    CASE WHEN nd > 1 AND (CAST(s2 AS DOUBLE)
      |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / nd) > 0
      |      THEN sqrt((CAST(s2 AS DOUBLE)
      |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / nd)
      |        / (nd - 1)) END AS sigma
      |  FROM (SELECT event_type, count(*) AS nd, CAST(sum(v) AS BIGINT) AS s1,
      |          sum(CAST(v AS HUGEINT) * v) AS s2
      |        FROM daily GROUP BY 1) g""".stripMargin

  def saxSymbols(spark: SparkSession, dir: String): DataFrame = {
    val daily = dailyCents(spark, dir)
    val stats = exactStats(daily)
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
    s"""WITH daily AS ($dailyCentsSql),
       |stats AS ($exactStatsSql),
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
