package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Rate/mix (price-volume) decomposition — SURVEY.md §2.281.
  */
object MixShift {

  /** §2.281 `mix_shift`: per-segment decomposition of the revenue
    * change between the two calendar halves into a VOLUME effect
    * (order-count change at period-1 value) and a RATE effect
    * (average-order-value change at period-2 volume) — the classic
    * price-volume-mix bridge behind every "why did revenue move"
    * review. The two effects sum to the segment's revenue delta by
    * construction (volume + rate = (n₂−n₁)·aov₁ + n₂·(aov₂−aov₁) =
    * rev₂ − rev₁ — exact algebra, spec-pinned), so the report is an
    * audit-proof bridge, not an approximation.
    *
    * Periods split at the FLOORED calendar midpoint (the §2.254 DiD
    * lesson: Spark CAST truncates where DuckDB rounds — flooring
    * explicitly on both engines keeps odd spans aligned).
    *
    * Scale shape: orders⋈customer is fact⋈data-proportional-dim —
    * pinned shuffle_hash (small-SF stats would broadcast customer and
    * die at scale, the §6 round-5 trap); calendar bounds are a 1-row
    * broadcast; the decomposition runs on the |segments|×2 cell frame.
    *
    * Determinism: cells carry exact BIGINT counts + cents; each
    * effect is ONE fixed-sequence float expression over those
    * integers, rounded 4 dp. */
  def mixShift(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("day"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment").as("segment"))
    val bounds = o.agg(min("day").as("d0"),
      floor(datediff(max("day"), min("day")) / 2).cast("long").as("half"))
    val cells = o.join(c.hint("shuffle_hash"),
        col("o_custkey") === col("c_custkey"))
      .crossJoin(broadcast(bounds))
      .withColumn("period",
        when(datediff(col("day"), col("d0")).cast("long") < col("half"), 1L)
          .otherwise(2L))
      .groupBy("segment", "period")
      .agg(count(lit(1)).as("n"), sum("cents").as("cents"))
    val wide = cells.groupBy("segment")
      .agg(sum(when(col("period") === 1, col("n"))).as("n1"),
        sum(when(col("period") === 1, col("cents"))).as("c1"),
        sum(when(col("period") === 2, col("n"))).as("n2"),
        sum(when(col("period") === 2, col("cents"))).as("c2"))
    wide.select(col("segment"), col("n1"), col("n2"),
        round(col("c1").cast("double") / 100.0, 2).as("rev1"),
        round(col("c2").cast("double") / 100.0, 2).as("rev2"),
        round((col("c2") - col("c1")).cast("double") / 100.0, 2)
          .as("delta"),
        round((col("n2") - col("n1")).cast("double") * col("c1")
          / col("n1") / 100.0, 4).as("volume_effect"),
        round((col("c2").cast("double") - col("n2").cast("double")
          * col("c1") / col("n1")) / 100.0, 4).as("rate_effect"))
      .orderBy("segment")
  }

  val mixShiftSql: String =
    s"""WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
       |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
       |b AS (SELECT min(day) AS d0,
       |    (max(day) - min(day)) // 2 AS half FROM o),
       |cells AS (SELECT c_mktsegment AS segment,
       |    CASE WHEN day - d0 < half THEN 1 ELSE 2 END AS period,
       |    count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents
       |  FROM o JOIN customer ON o_custkey = c_custkey CROSS JOIN b
       |  GROUP BY 1, 2),
       |wide AS (SELECT segment,
       |    CAST(sum(CASE WHEN period = 1 THEN n END) AS BIGINT) AS n1,
       |    CAST(sum(CASE WHEN period = 1 THEN cents END) AS BIGINT) AS c1,
       |    CAST(sum(CASE WHEN period = 2 THEN n END) AS BIGINT) AS n2,
       |    CAST(sum(CASE WHEN period = 2 THEN cents END) AS BIGINT) AS c2
       |  FROM cells GROUP BY 1)
       |SELECT segment, n1, n2,
       |  round(CAST(c1 AS DOUBLE) / 100.0, 2) AS rev1,
       |  round(CAST(c2 AS DOUBLE) / 100.0, 2) AS rev2,
       |  round(CAST(c2 - c1 AS DOUBLE) / 100.0, 2) AS delta,
       |  round(CAST(n2 - n1 AS DOUBLE) * c1 / n1 / 100.0, 4)
       |    AS volume_effect,
       |  round((CAST(c2 AS DOUBLE) - CAST(n2 AS DOUBLE) * c1 / n1)
       |    / 100.0, 4) AS rate_effect
       |FROM wide ORDER BY segment""".stripMargin
}
