package graft.dq

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** t-closeness flag threshold (Li, Li & Venkatasubramanian 2007
    * suggest t ≈ 0.15–0.25 for ordered attributes). */
  val TThreshold = 0.2

  /** §2.341 `t_closeness`: the third rung of the release ladder —
    * k-anonymity bounds group SIZE, l-diversity bounds sensitive
    * VARIETY, t-closeness bounds sensitive DISTRIBUTION: a group whose
    * balance-band distribution sits far from the corpus-wide one leaks
    * ("everyone in this (nation, segment) cell is in the top band")
    * even at high k and l. Per QI config (nation / nation+segment):
    * group count, band count, the MAX earth-mover's distance between
    * any group's band distribution and the global one, and how many
    * groups exceed [[TThreshold]].
    *
    * EMD on an ORDERED categorical is the L1 gap of the cumulative
    * distributions normalized by (m−1): Σ_v |CumG(v) − CumAll(v)| /
    * (m−1) — the 1-D transport closed form, no LP solve.
    *
    * Scale shape: the corpus collapses to (QI, band) cells in ONE
    * map-side groupBy per config; the full group×band grid is the
    * bounded distinct-groups frame broadcast-crossed with the ≤ |bands|
    * frame (a BNLJ whose broadcast side is aggregate-bounded — the
    * §2.334 allowance); cumulative windows run PER GROUP over that
    * grid; the global cum is a |bands|-row broadcast. Nothing past the
    * first aggregate touches the corpus.
    *
    * Determinism: each |CumG·N − CumAll·n_g| is an EXACT
    * DECIMAL(38,0) ≡ HUGEINT cross-multiply (BIGINT products die at
    * ~10¹⁰ rows²); per-group EMD is ONE division of integer-valued
    * doubles rounded 6 dp; the threshold compare runs on the rounded
    * value (identical doubles both engines); single-band degenerates
    * (m = 1) INTEGER-gate EMD to 0. */
  def tCloseness(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("seg"),
        balBand(col("c_acctbal")).as("band"))

    def audit(config: String, qi: Seq[String]): DataFrame = {
      val cells = cust.groupBy((qi :+ "band").map(col): _*)
        .agg(count(lit(1)).as("cnt"))
      val groups = cells.select(qi.map(col): _*).distinct()
      val bands = cells.select("band").distinct()
      val grid = groups.join(broadcast(bands))
      val full = grid.join(cells, qi :+ "band", "left")
        .na.fill(0L, Seq("cnt"))
      val wGrp = Window.partitionBy(qi.map(col): _*)
      val wGrpCum = wGrp.orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val glob = cust.groupBy("band").agg(count(lit(1)).as("gcnt"))
        .withColumn("cum_all", sum("gcnt").over(Window.orderBy("band")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n_all", sum("gcnt").over(Window.partitionBy(lit(1))))
        .withColumn("m_bands",
          count(lit(1)).over(Window.partitionBy(lit(1))))
        .select("band", "cum_all", "n_all", "m_bands")
      val perGroup = full
        .withColumn("cum_g", sum("cnt").over(wGrpCum))
        .withColumn("n_g", sum("cnt").over(wGrp))
        .join(broadcast(glob), "band")
        // exact cross-multiply in DECIMAL(38,0): |cum_g·N − cum_all·n_g|
        .withColumn("diff_num", expr(
          """abs(CAST(cum_g AS DECIMAL(38,0)) * n_all
            |  - CAST(cum_all AS DECIMAL(38,0)) * n_g)""".stripMargin))
        .groupBy(qi.map(col): _*)
        .agg(expr("sum(diff_num)").as("sum_diff"),
          max("n_g").as("n_g"), max("n_all").as("n_all"),
          max("m_bands").as("m_bands"))
        .withColumn("t", when(col("m_bands") > 1L, round(
          col("sum_diff").cast("double") /
            (col("n_g").cast("double") * col("n_all").cast("double") *
              (col("m_bands") - lit(1L)).cast("double")), 6))
          .otherwise(lit(0.0)))
      perGroup.agg(
        count(lit(1)).as("n_groups"),
        max("m_bands").as("m_bands"),
        max("t").as("max_t"),
        sum(when(col("t") > TThreshold, 1L).otherwise(0L)).as("n_above"))
        .select(lit(config).as("qi_config"), col("n_groups"),
          col("m_bands"), col("max_t"), col("n_above"),
          round(col("n_above").cast("double") /
            col("n_groups").cast("double"), 6).as("share_above"))
    }

    audit("nation", Seq("nation"))
      .unionAll(audit("nation_seg", Seq("nation", "seg")))
      .orderBy("qi_config")
  }

  val tClosenessSql: String = {
    def one(config: String, qiCols: String): String =
      s"""SELECT '$config' AS qi_config, count(*) AS n_groups,
         |    CAST(max(m_bands) AS BIGINT) AS m_bands,
         |    max(t) AS max_t,
         |    CAST(sum(CASE WHEN t > $TThreshold THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_above,
         |    round(CAST(sum(CASE WHEN t > $TThreshold THEN 1 ELSE 0 END)
         |        AS DOUBLE) / count(*), 6) AS share_above
         |  FROM (
         |    SELECT $qiCols,
         |      CAST(max(m_bands) AS BIGINT) AS m_bands,
         |      CASE WHEN max(m_bands) > 1 THEN round(
         |        CAST(sum(diff_num) AS DOUBLE)
         |          / (CAST(max(n_g) AS DOUBLE) * CAST(max(n_all) AS DOUBLE)
         |             * CAST(max(m_bands) - 1 AS DOUBLE)), 6)
         |      ELSE 0.0 END AS t
         |    FROM (
         |      SELECT $qiCols, g.band,
         |        abs(CAST(cum_g AS HUGEINT) * n_all
         |          - CAST(cum_all AS HUGEINT) * n_g) AS diff_num,
         |        n_g, n_all, m_bands
         |      FROM (
         |        SELECT $qiCols, band,
         |          CAST(sum(cnt) OVER (PARTITION BY $qiCols ORDER BY band
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |            AS BIGINT) AS cum_g,
         |          CAST(sum(cnt) OVER (PARTITION BY $qiCols) AS BIGINT)
         |            AS n_g
         |        FROM (
         |          SELECT $qiCols, b.band,
         |            COALESCE(c.cnt, 0) AS cnt
         |          FROM (SELECT DISTINCT $qiCols FROM cust) grp
         |          CROSS JOIN (SELECT DISTINCT band FROM cust) b
         |          LEFT JOIN (SELECT $qiCols, band, count(*) AS cnt
         |            FROM cust GROUP BY ALL) c USING ($qiCols, band)
         |        ) filled
         |      ) g
         |      JOIN (
         |        SELECT band,
         |          CAST(sum(gcnt) OVER (ORDER BY band
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |            AS BIGINT) AS cum_all,
         |          CAST(sum(gcnt) OVER () AS BIGINT) AS n_all,
         |          CAST(count(*) OVER () AS BIGINT) AS m_bands
         |        FROM (SELECT band, count(*) AS gcnt FROM cust GROUP BY 1)
         |          gb
         |      ) gall ON g.band = gall.band
         |    ) cells GROUP BY $qiCols
         |  ) per_group""".stripMargin
    s"""WITH cust AS (SELECT CAST(c_nationkey AS BIGINT) AS nation,
       |    c_mktsegment AS seg,
       |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band
       |  FROM customer)
       |${one("nation", "nation")}
       |UNION ALL
       |${one("nation_seg", "nation, seg")}
       |ORDER BY qi_config""".stripMargin
  }
}
