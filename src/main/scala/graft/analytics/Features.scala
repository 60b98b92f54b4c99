package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Categorical feature engineering — SURVEY.md §2.227. */
object Features {

  /** Smoothing pseudo-count m: the encoding of a category with n ≪ m
    * rows shrinks toward the global prior (the standard empirical-
    * Bayes guard against small-category overfit). */
  val SmoothM = 20L

  /** §2.227 `target_encode`: smoothed mean-target encoding of the
    * customer market segment against order revenue — the categorical
    * feature builder gradient models consume (raw one-hot explodes at
    * high cardinality; the mean-target encoding compresses a category
    * to one informative float). Per category: n, raw mean target,
    * smoothed encoding (n·mean + m·prior)/(n + m), and the
    * leave-one-out encoding spread sd(y)/(n−1) — the quantity that
    * says how much any single row can move its own feature value (the
    * LOO leakage-risk gauge; enc_i = (S−y_i)/(n−1) is affine in y_i,
    * so its sd needs no per-row second pass).
    *
    * Scale shape: broadcast dim join (orders ⋈ customer segment),
    * then ONE map-side-combined groupBy to ≤|segments| cells carrying
    * exact integer moments — n, Σcents (BIGINT), Σcents²
    * (DECIMAL(38,0)/HUGEINT, the §2.223 overflow-proof sum); the
    * prior re-aggregates the cell frame. Every reported float is a
    * fixed-sequence expression of those identical integers. */
  def targetEncode(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val joined = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .join(broadcast(Tables.customer(spark, dir)
        .select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment").as("category"))), "o_custkey")
    val cells = joined.groupBy("category").agg(
      count(lit(1)).as("n"),
      sum("cents").as("s"),
      sum((col("cents").cast(dec) * col("cents").cast(dec)).cast(dec))
        .as("s2"))
    val prior = cells.agg(sum("n").as("nt"), sum("s").as("st"))
    def d(c: String) = col(c).cast("double")
    cells.crossJoin(broadcast(prior))
      .withColumn("mean_target", d("s") / 100.0 / col("n"))
      .withColumn("prior", d("st") / 100.0 / col("nt"))
      .withColumn("sd_target",
        sqrt((d("s2") - d("s") * d("s") / col("n")) / (col("n") - 1))
          / 100.0)
      .select(col("category"), col("n"),
        round(col("mean_target"), 4).as("mean_target"),
        round((col("mean_target") * col("n") + col("prior") * SmoothM) /
          (col("n") + SmoothM), 4).as("smoothed_enc"),
        round(col("sd_target") / (col("n") - 1), 6).as("loo_sd"))
      .orderBy("category")
  }

  val targetEncodeSql: String =
    s"""WITH j AS (SELECT c.c_mktsegment AS category,
       |    CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
       |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
       |cells AS (SELECT category, count(*) AS n,
       |    CAST(sum(cents) AS BIGINT) AS s,
       |    sum(CAST(cents AS HUGEINT) * cents) AS s2
       |  FROM j GROUP BY 1),
       |p AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
       |    CAST(sum(s) AS BIGINT) AS st FROM cells),
       |x AS (SELECT category, n,
       |    CAST(s AS DOUBLE) / 100.0 / n AS mean_target,
       |    CAST(st AS DOUBLE) / 100.0 / nt AS prior,
       |    sqrt((CAST(s2 AS DOUBLE)
       |        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1))
       |      / 100.0 AS sd_target
       |  FROM cells CROSS JOIN p)
       |SELECT category, n, round(mean_target, 4) AS mean_target,
       |  round((mean_target * n + prior * $SmoothM) / (n + $SmoothM), 4)
       |    AS smoothed_enc,
       |  round(sd_target / (n - 1), 6) AS loo_sd
       |FROM x ORDER BY category""".stripMargin
}
