package graft.dq

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Missingness-pattern mining — SURVEY.md §2.345.
  *
  * The DQ suite so far checks nulls one column at a time (§2.2's
  * not-null expectations). Real pipelines lose fields in CORRELATED
  * clumps — an upstream join that failed populates neither name nor
  * address; a consent flag hides balance AND segment together — and
  * the repair strategy (drop row vs impute vs re-extract) depends on
  * the PATTERN, not the marginal rates. This is Little & Rubin's
  * missingness analysis operationalized: the support of every observed
  * null-pattern (the row's missing-column set), plus the pairwise
  * co-missingness LIFT P(a∧b)/(P(a)·P(b)) that separates MCAR
  * (lift ≈ 1) from structurally linked gaps (lift ≫ 1).
  *
  * The test corpus has no physical nulls, so the op mines a
  * DETERMINISTIC dirty twin derived in-query (the §2.335
  * record-linkage fixture pattern): bal is MCAR on custkey % 7, seg
  * MCAR on % 11, name co-missing with bal on even keys (lift 2 by
  * construction), and nation missing-at-random conditional on the
  * AUTOMOBILE segment — so the output provably separates the planted
  * mechanisms. On a real lake the twin frame is replaced by
  * `isnull()` flags on the raw columns; everything downstream is
  * unchanged.
  *
  * Scale shape: ONE map-side-combined groupBy collapses the corpus to
  * ≤ 2⁴ pattern cells; the pairwise tallies are ONE aggregate row
  * (conditional sums, no second scan — Spark shares the scan via the
  * union of two aggregates over the same child); every lift is a
  * single division of exact BIGINT cross-products. Support rounds at
  * 6 dp from exact integers. Zero-able denominators (a column that is
  * never null) are INTEGER-gated to NULL lift (both engines). */
object NullPatterns {

  /** §2.345 `null_pattern`: per observed missing-column set its count
    * and support; per column pair its co-missing count, support, and
    * lift. `kind` ∈ ('pattern', 'pair'). */
  def nullPattern(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    // deterministic missingness flags (1 = missing)
    val flags = cust.select(
      when(col("c_custkey") % 7 === 0 && col("c_custkey") % 2 === 0, 1L)
        .otherwise(0L).as("m_name"),
      when(col("c_mktsegment") === "AUTOMOBILE" && col("c_custkey") % 3 === 0,
        1L).otherwise(0L).as("m_nation"),
      when(col("c_custkey") % 7 === 0, 1L).otherwise(0L).as("m_bal"),
      when(col("c_custkey") % 11 === 0, 1L).otherwise(0L).as("m_seg"))
    val cols = Seq("bal", "name", "nation", "seg") // alphabetical
    // ≤16 pattern cells, one map-side-combined pass
    val patterns = flags
      .groupBy(cols.map(c => col(s"m_$c")): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("key", {
        val parts = cols.map(c => when(col(s"m_$c") === 1, lit(c)))
        concat_ws(",", parts: _*)
      })
      .withColumn("key",
        when(col("key") === "", lit("complete")).otherwise(col("key")))
    val total = patterns.agg(sum("n").as("n_total"))
    val patRows = patterns.crossJoin(broadcast(total))
      .select(lit("pattern").as("kind"), col("key"), col("n"),
        round(col("n").cast("double") / col("n_total"), 6).as("support"),
        lit(null).cast("double").as("lift"))
    // marginal + pairwise tallies in ONE aggregate row
    val pairs = cols.combinations(2).toSeq.map { case Seq(a, b) => (a, b) }
    val marg = flags.agg(
      count(lit(1)).as("n_total"),
      cols.map(c => sum(col(s"m_$c")).as(s"n_$c")) ++
        pairs.map { case (a, b) =>
          sum(col(s"m_$a") * col(s"m_$b")).as(s"n_${a}_$b") }: _*)
    val pairRows = pairs.map { case (a, b) =>
      marg.select(lit("pair").as("kind"), lit(s"$a&$b").as("key"),
        col(s"n_${a}_$b").as("n"),
        round(col(s"n_${a}_$b").cast("double") / col("n_total"), 6)
          .as("support"),
        // lift = n_ab·N / (n_a·n_b), integer-gated when either
        // marginal is zero (both engines return NULL, never divide)
        when(col(s"n_$a") * col(s"n_$b") > 0,
          round((col(s"n_${a}_$b") * col("n_total")).cast("double") /
            (col(s"n_$a") * col(s"n_$b")).cast("double"), 6))
          .otherwise(lit(null).cast("double")).as("lift"))
    }.reduce(_.unionByName(_))
    patRows.unionByName(pairRows).orderBy("kind", "key")
  }

  val nullPatternSql: String = {
    val cols = Seq("bal", "name", "nation", "seg")
    val pairs = cols.combinations(2).toSeq.map { case Seq(a, b) => (a, b) }
    val pairSelects = pairs.map { case (a, b) =>
      s"""SELECT 'pair' AS kind, '$a&$b' AS key, n_${a}_$b AS n,
         |  round(CAST(n_${a}_$b AS DOUBLE) / n_total, 6) AS support,
         |  CASE WHEN n_$a * n_$b > 0 THEN
         |    round(CAST(n_${a}_$b * n_total AS DOUBLE)
         |      / CAST(n_$a * n_$b AS DOUBLE), 6)
         |  ELSE NULL END AS lift FROM marg""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH flags AS (SELECT
       |    CASE WHEN c_custkey % 7 = 0 AND c_custkey % 2 = 0
       |      THEN 1 ELSE 0 END AS m_name,
       |    CASE WHEN c_mktsegment = 'AUTOMOBILE' AND c_custkey % 3 = 0
       |      THEN 1 ELSE 0 END AS m_nation,
       |    CASE WHEN c_custkey % 7 = 0 THEN 1 ELSE 0 END AS m_bal,
       |    CASE WHEN c_custkey % 11 = 0 THEN 1 ELSE 0 END AS m_seg
       |  FROM customer),
       |pat AS (SELECT m_bal, m_name, m_nation, m_seg, count(*) AS n
       |  FROM flags GROUP BY 1, 2, 3, 4),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM pat),
       |marg AS (SELECT count(*) AS n_total,
       |    ${cols.map(c => s"CAST(sum(m_$c) AS BIGINT) AS n_$c").mkString(", ")},
       |    ${pairs.map { case (a, b) =>
              s"CAST(sum(m_$a * m_$b) AS BIGINT) AS n_${a}_$b" }
             .mkString(", ")}
       |  FROM flags)
       |SELECT kind, key, n, support, lift FROM (
       |SELECT 'pattern' AS kind,
       |  CASE WHEN m_bal = 0 AND m_name = 0 AND m_nation = 0 AND m_seg = 0
       |    THEN 'complete'
       |    ELSE concat_ws(',',
       |      CASE WHEN m_bal = 1 THEN 'bal' END,
       |      CASE WHEN m_name = 1 THEN 'name' END,
       |      CASE WHEN m_nation = 1 THEN 'nation' END,
       |      CASE WHEN m_seg = 1 THEN 'seg' END) END AS key,
       |  n, round(CAST(n AS DOUBLE) / n_total, 6) AS support,
       |  CAST(NULL AS DOUBLE) AS lift
       |FROM pat CROSS JOIN tot
       |UNION ALL
       |$pairSelects) u ORDER BY kind, key""".stripMargin
  }
}
