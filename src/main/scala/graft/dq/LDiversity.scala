package graft.dq

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** l-diversity release audit — SURVEY.md §2.352.
  *
  * §2.221 reports DISTINCT l (how many sensitive values a QI group
  * carries) — the weakest form: a group that is 99% one band and 1%
  * another is 2-diverse yet leaks with near-certainty. Machanavajjhala
  * et al. (2007) define the two production-strength variants this op
  * completes the ladder with:
  *  - **entropy l-diversity**: −Σ p·ln p ≥ ln l per group — the
  *    skew-aware form;
  *  - **recursive (c,l)-diversity** at (c=2, l=2): the most common
  *    sensitive value must not dominate — r₁ ≤ c·Σ_{i≥l} rᵢ, i.e.
  *    the group survives even if the adversary discounts the tail.
  * §2.341's t-closeness bounds distance to the GLOBAL distribution;
  * these bound each group's OWN concentration — the two fail on
  * different groups by design.
  *
  * Determinism: per-group entropy over band counts reduces to
  * ln n_g − (Σ cnt·ln cnt)/n_g — ln only ever sees INTEGER arguments
  * (the §2.342 convention), each cnt·round(10⁹·ln cnt) an exact
  * BIGINT, ONE HALF-UP division per group; the entropy ≥ ln 2 gate is
  * the INTEGER compare on nano-units, and the recursive test
  * r₁ > c·(n_g − r₁) is pure integer. Dividends non-negative
  * throughout (counts), so truncating/flooring div agree.
  *
  * Scale shape: per QI config ONE map-side groupBy collapses the
  * corpus to (QI, band) cells; group rollups and the audit run on
  * that bounded frame (windows PER GROUP, never global). */
object LDiversity {

  /** Recursive-diversity dominance factor (the paper's c). */
  val CFactor = 2L

  /** §2.352 `l_diversity`: per QI config — groups, min distinct l,
    * min entropy (nats), groups under the entropy-ln2 floor, and
    * groups failing recursive (2,2)-diversity. */
  def lDiversity(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("seg"),
        Privacy.balBand(col("c_acctbal")).as("band"),
        floor(col("c_acctbal") / 200.0).cast("long").as("sens"))
    def li(x: String) = s"CAST(round(1e9 * ln(CAST($x AS DOUBLE))) AS BIGINT)"

    def audit(config: String, qi: Seq[String]): DataFrame = {
      val cells = cust.groupBy((qi :+ "sens").map(col): _*)
        .agg(count(lit(1)).as("cnt"))
      val groups = cells.groupBy(qi.map(col): _*)
        .agg(count(lit(1)).as("l"),
          sum("cnt").as("n_g"),
          max("cnt").as("top_cnt"),
          sum(expr(s"cnt * ${li("cnt")}")).as("sum_clc"))
        .withColumn("ent_e9", expr(
          s"${li("n_g")} - (2 * sum_clc + n_g) div (2 * n_g)"))
        .withColumn("fail_ent", (col("ent_e9") < expr(li("2"))).cast("long"))
        .withColumn("fail_rec", (col("top_cnt") >
          lit(CFactor) * (col("n_g") - col("top_cnt"))).cast("long"))
      groups.agg(
        count(lit(1)).as("n_groups"),
        min("l").as("min_l"),
        round(min("ent_e9").cast("double") / 1e9, 6).as("min_entropy"),
        sum("fail_ent").as("n_below_ln2"),
        sum("fail_rec").as("n_fail_recursive"))
        .select(lit(config).as("qi_config"), col("n_groups"),
          col("min_l"), col("min_entropy"), col("n_below_ln2"),
          col("n_fail_recursive"))
    }

    audit("coarse", Seq("nation", "seg"))
      .unionAll(audit("fine", Seq("nation", "seg", "band")))
      .orderBy("qi_config")
  }

  val lDiversitySql: String = {
    def li(x: String) = s"CAST(round(1e9 * ln(CAST($x AS DOUBLE))) AS BIGINT)"
    def one(config: String, qiCols: String): String =
      s"""SELECT '$config' AS qi_config, count(*) AS n_groups,
         |    CAST(min(l) AS BIGINT) AS min_l,
         |    round(CAST(min(ent_e9) AS DOUBLE) / 1e9, 6) AS min_entropy,
         |    CAST(sum(CASE WHEN ent_e9 < ${li("2")} THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_below_ln2,
         |    CAST(sum(CASE WHEN top_cnt > $CFactor * (n_g - top_cnt)
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_recursive
         |  FROM (SELECT count(*) AS l, CAST(sum(cnt) AS BIGINT) AS n_g,
         |      CAST(max(cnt) AS BIGINT) AS top_cnt,
         |      ${li("CAST(sum(cnt) AS BIGINT)")}
         |        - (2 * CAST(sum(cnt * ${li("cnt")}) AS BIGINT)
         |           + CAST(sum(cnt) AS BIGINT))
         |          // (2 * CAST(sum(cnt) AS BIGINT)) AS ent_e9
         |    FROM (SELECT $qiCols, sens, count(*) AS cnt
         |      FROM c GROUP BY $qiCols, sens) cells
         |    GROUP BY $qiCols) g""".stripMargin
    s"""WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nation,
       |    c_mktsegment AS seg,
       |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band,
       |    CAST(floor(c_acctbal / 200.0) AS BIGINT) AS sens
       |  FROM customer)
       |${one("coarse", "nation, seg")}
       |UNION ALL
       |${one("fine", "nation, seg, band")}
       |ORDER BY qi_config""".stripMargin
  }
}
