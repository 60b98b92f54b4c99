package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-token budget planning — SURVEY.md §2.339.
  *
  * Before a training run, the corpus team fixes a TOKEN BUDGET and
  * splits it across sources. Proportional-to-size sampling lets the
  * biggest crawl drown everything; uniform ignores size entirely. The
  * standard middle ground is TEMPERATURE sampling (multilingual BERT /
  * XLM-R, τ = 0.5): weight each source by √(its natural token mass),
  * which upweights the tail without flattening the head. The plan
  * must then answer the data-constrained question (Muennighoff 2023):
  * how many EPOCHS of each source does its allocation imply, and
  * which sources exceed the ~4-epoch point of diminishing returns?
  * §2.75/§2.332 allocate document COUNTS under share caps; this plans
  * the token budget itself with √-temperature weights + epoch audit.
  */
object Budget {

  /** §2.339 `token_budget_plan`: per source — natural token mass
    * (n_chars as the deterministic token proxy, the §2.309
    * convention), integer √-weight, the largest-remainder allocation
    * of a budget B = half the corpus, its share of B, implied epochs,
    * and the >4-epoch flag.
    *
    * Scale shape: ONE map-side groupBy collapses the corpus to the
    * |sources|-bounded frame; every total/rank is a window over that
    * frame; nothing after the first aggregate touches the corpus.
    *
    * Determinism: the √ weight is an EXACT integer square root —
    * floor(sqrt(double)) corrected by ±1 integer comparisons, so a
    * last-ulp sqrt wobble can never shift a weight (the engines'
    * sqrt agree, but the correction makes agreement unnecessary).
    * Quota products B·w run as DECIMAL(38,0) ≡ HUGEINT (BIGINT
    * overflows at ~10¹⁹ token-scale products — the 100 TB regime);
    * base = quota div ΣW and the remainder ranking are exact integer
    * arithmetic with (remainder DESC, source ASC) tie-break; Σalloc
    * = B exactly by construction. Shares/epochs are single divisions
    * of integer-valued doubles rounded at 6/4 dp; the epoch flag is
    * an integer cross-multiply (alloc > 4·nat), never a float
    * boundary. */
  def tokenBudgetPlan(spark: SparkSession, dir: String): DataFrame = {
    val nat = Tables.documents(spark, dir)
      .groupBy("source").agg(sum("n_chars").as("nat_tokens"))
    // exact integer sqrt: float sqrt, then ±1 correction in BIGINT
    val s0 = floor(sqrt(col("nat_tokens").cast("double"))).cast("long")
    val w = Window.partitionBy(lit(1))
    val staged = nat
      .withColumn("s0", s0)
      .withColumn("weight",
        when((col("s0") + 1L) * (col("s0") + 1L) <= col("nat_tokens"),
          col("s0") + 1L)
          .when(col("s0") * col("s0") > col("nat_tokens"), col("s0") - 1L)
          .otherwise(col("s0")))
      // long `/` is double division in the Column API; div keeps BIGINT
      .withColumn("tot_nat", sum("nat_tokens").over(w))
      .withColumn("budget", expr("tot_nat div 2"))
      .withColumn("w_tot", sum("weight").over(w))
      // quota = B·w as DECIMAL(38,0): exact far past BIGINT range
      .withColumn("quota", expr(
        "CAST(CAST(budget AS DECIMAL(38,0)) * weight AS DECIMAL(38,0))"))
      .withColumn("base", expr("CAST(quota div w_tot AS BIGINT)"))
      .withColumn("rem", expr("CAST(quota % w_tot AS DECIMAL(38,0))"))
    val wRank = Window.orderBy(col("rem").desc, col("source"))
    def dbl(c: Column): Column = c.cast("double")
    staged
      .withColumn("leftover", col("budget") - sum("base").over(w))
      .withColumn("rk", row_number().over(wRank))
      .withColumn("alloc_tokens",
        col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
      .withColumn("share", when(col("budget") > 0L,
        round(dbl(col("alloc_tokens")) / dbl(col("budget")), 6)))
      .withColumn("epochs", when(col("nat_tokens") > 0L,
        round(dbl(col("alloc_tokens")) / dbl(col("nat_tokens")), 4)))
      .withColumn("over_4_epochs",
        when(col("alloc_tokens") > lit(4L) * col("nat_tokens"), 1L)
          .otherwise(0L))
      .select("source", "nat_tokens", "weight", "alloc_tokens", "share",
        "epochs", "over_4_epochs")
      .orderBy("source")
  }

  val tokenBudgetPlanSql: String =
    """WITH nat AS (SELECT source, CAST(sum(n_chars) AS BIGINT)
      |    AS nat_tokens
      |  FROM documents GROUP BY 1),
      |sq AS (SELECT *,
      |    CAST(floor(sqrt(CAST(nat_tokens AS DOUBLE))) AS BIGINT) AS s0
      |  FROM nat),
      |wt AS (SELECT source, nat_tokens,
      |    CASE WHEN (s0 + 1) * (s0 + 1) <= nat_tokens THEN s0 + 1
      |         WHEN s0 * s0 > nat_tokens THEN s0 - 1
      |         ELSE s0 END AS weight
      |  FROM sq),
      |tot AS (SELECT *,
      |    CAST(sum(nat_tokens) OVER () AS BIGINT) // 2 AS budget,
      |    CAST(sum(weight) OVER () AS BIGINT) AS w_tot
      |  FROM wt),
      |quo AS (SELECT *,
      |    CAST(CAST(budget AS HUGEINT) * weight // w_tot AS BIGINT)
      |      AS base,
      |    CAST(budget AS HUGEINT) * weight % w_tot AS rem
      |  FROM tot),
      |rk AS (SELECT *,
      |    CAST(budget - sum(base) OVER () AS BIGINT) AS leftover,
      |    row_number() OVER (ORDER BY rem DESC, source) AS rk
      |  FROM quo)
      |SELECT source, nat_tokens, weight,
      |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
      |    AS alloc_tokens,
      |  CASE WHEN budget > 0 THEN round(
      |    CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
      |      AS DOUBLE) / CAST(budget AS DOUBLE), 6) END AS share,
      |  CASE WHEN nat_tokens > 0 THEN round(
      |    CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
      |      AS DOUBLE) / CAST(nat_tokens AS DOUBLE), 4) END AS epochs,
      |  CASE WHEN base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
      |    > 4 * nat_tokens THEN 1 ELSE 0 END AS over_4_epochs
      |FROM rk ORDER BY source""".stripMargin
}
