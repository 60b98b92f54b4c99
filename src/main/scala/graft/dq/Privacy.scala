package graft.dq

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Privacy-risk audit — SURVEY.md §2.221.
  *
  * Before a table leaves the warehouse (vendor share, training-data
  * export, analyst sandbox) the release checklist asks: how
  * re-identifiable are its rows? k-anonymity (Sweeney 2002) is the
  * standard first answer — every quasi-identifier combination must be
  * shared by ≥ k rows — and l-diversity (Machanavalikrishnan et al.
  * 2007) patches its homogeneity hole (a group of 50 rows that all
  * share the same sensitive value is 50-anonymous and still leaks).
  */
object Privacy {

  /** Groups smaller than this are flagged as re-identification risk. */
  val KThreshold = 5L

  /** Fixed-width account-balance band (the coarse public attribute an
    * adversary could know); fixed edges, not quantiles, so the QI
    * definition is stable as the corpus grows (the §2.204 argument). */
  def balBand(c: Column): Column = floor(c / 1000.0).cast("long")

  /** §2.221 `k_anonymity`: k-anonymity / l-diversity audit of the
    * customer table under two released-view QI definitions — coarse
    * (nation, segment) and fine (nation, segment, balance band), the
    * sensitive attribute being the exact account balance. Per config:
    * group count, min/median k, rows in groups below [[KThreshold]],
    * and the minimum per-group sensitive-value diversity l.
    *
    * Scale shape: per config ONE map-side-combined groupBy collapses
    * the table to QI-cardinality-bounded group stats (the sensitive
    * diversity is a single countDistinct → Spark's two-phase distinct,
    * no Expand since it's the only distinct agg); the audit report
    * aggregates that bounded frame. Median k is interpolated over
    * identical integers (the §2.141 percentile convention). */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_nationkey"), col("c_mktsegment"),
        balBand(col("c_acctbal")).as("bal_band"), col("c_acctbal"))

    def audit(config: String, qi: Seq[String]): DataFrame = {
      val groups = cust.groupBy(qi.map(col): _*)
        .agg(count(lit(1)).as("k"),
          countDistinct(col("c_acctbal")).as("l"))
      groups.agg(
        count(lit(1)).as("n_groups"),
        sum("k").as("n_rows"),
        min("k").as("min_k"),
        expr("percentile(k, 0.5)").as("median_k"),
        sum(when(col("k") < KThreshold, col("k")).otherwise(0L))
          .as("rows_below_k"),
        min("l").as("min_l"))
        .select(lit(config).as("qi_config"), col("n_groups"), col("n_rows"),
          col("min_k"), round(col("median_k"), 4).as("median_k"),
          col("rows_below_k"),
          round(col("rows_below_k").cast("double") / col("n_rows"), 6)
            .as("risk_share"),
          col("min_l"))
    }

    audit("coarse", Seq("c_nationkey", "c_mktsegment"))
      .unionAll(audit("fine",
        Seq("c_nationkey", "c_mktsegment", "bal_band")))
      .orderBy("qi_config")
  }

  val kAnonymitySql: String = {
    def one(config: String, qiCols: String): String =
      s"""SELECT '$config' AS qi_config, count(*) AS n_groups,
         |    CAST(sum(k) AS BIGINT) AS n_rows,
         |    CAST(min(k) AS BIGINT) AS min_k,
         |    round(quantile_cont(k, 0.5), 4) AS median_k,
         |    CAST(sum(CASE WHEN k < $KThreshold THEN k ELSE 0 END)
         |      AS BIGINT) AS rows_below_k,
         |    round(CAST(sum(CASE WHEN k < $KThreshold THEN k ELSE 0 END)
         |        AS DOUBLE) / sum(k), 6) AS risk_share,
         |    CAST(min(l) AS BIGINT) AS min_l
         |  FROM (SELECT count(*) AS k,
         |      count(DISTINCT c_acctbal) AS l
         |    FROM c GROUP BY $qiCols) g""".stripMargin
    s"""WITH c AS (SELECT c_nationkey, c_mktsegment,
       |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
       |    c_acctbal
       |  FROM customer)
       |${one("coarse", "c_nationkey, c_mktsegment")}
       |UNION ALL
       |${one("fine", "c_nationkey, c_mktsegment, bal_band")}
       |ORDER BY qi_config""".stripMargin
  }
}
