package graft.dq

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Distribution-drift monitoring — SURVEY.md §2 item 80.
  *
  * Population Stability Index between two batch populations over
  * fixed-width histogram bins: psi = Σ (p_a − p_b)·ln(p_a / p_b).
  * The production shape of "does today's load look like yesterday's"
  * — the natural next step after the reference's static expectations
  * (range/type checks catch corruption; drift catches the upstream
  * behavior changes that pass every static check). PSI < 0.1 is the
  * conventional "stable" band.
  *
  * Here the two populations are the even/odd-orderkey halves of
  * lineitem (deterministic stand-ins for batch N−1 vs batch N).
  * Scale: one groupBy over the fact table (partial-agg'd), then
  * 10-row arithmetic against broadcast totals. Empty bins are floored
  * at 1e-6 before the log, per standard PSI practice. */
object Drift {

  val BinWidth = 5.0
  val Eps = 1e-6

  def dqDrift(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity"))
      .withColumn("is_a", col("l_orderkey") % 2 === 0)
      .withColumn("bin", floor((col("l_quantity") - 1) / BinWidth).cast("long"))
    val agg = li.groupBy("bin").agg(
      sum(when(col("is_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("is_a"), 1L).otherwise(0L)).as("n_b"))
    val tot = agg.agg(sum("n_a").as("ta"), sum("n_b").as("tb"))
    val pa = col("n_a") / col("ta")
    val pb = col("n_b") / col("tb")
    val paE = greatest(pa, lit(Eps))
    val pbE = greatest(pb, lit(Eps))
    agg.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_a"), col("n_b"),
        round(pa, 6).as("p_a"),
        round(pb, 6).as("p_b"),
        round((paE - pbE) * log(paE / pbE), 6).as("psi_term"))
      .orderBy("bin")
  }

  val dqDriftSql: String =
    s"""WITH b AS (SELECT CAST(floor((l_quantity - 1) / $BinWidth) AS BIGINT) AS bin,
       |    l_orderkey % 2 = 0 AS is_a FROM lineitem),
       |agg AS (SELECT bin,
       |    CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_b
       |  FROM b GROUP BY bin),
       |tot AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta,
       |    CAST(sum(n_b) AS BIGINT) AS tb FROM agg)
       |SELECT bin, n_a, n_b,
       |  round(n_a / CAST(ta AS DOUBLE), 6) AS p_a,
       |  round(n_b / CAST(tb AS DOUBLE), 6) AS p_b,
       |  round((greatest(n_a / CAST(ta AS DOUBLE), $Eps)
       |       - greatest(n_b / CAST(tb AS DOUBLE), $Eps))
       |    * ln(greatest(n_a / CAST(ta AS DOUBLE), $Eps)
       |       / greatest(n_b / CAST(tb AS DOUBLE), $Eps)), 6) AS psi_term
       |FROM agg CROSS JOIN tot ORDER BY bin""".stripMargin
}
