package graft.dq

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Benford first-digit conformance audit — SURVEY.md §2.239.
  *
  * Naturally-arising monetary amounts (prices × quantities, order
  * totals) follow Benford's law: P(first digit = d) = log10(1 + 1/d)
  * (Benford 1938, Hill 1995). Fabricated, truncated, or defaulted
  * values don't — which makes the first-digit histogram a cheap fraud
  * and data-quality screen the finance-audit world has used for
  * decades (Nigrini 1996). The reference's DQ layer checks nulls and
  * ranges (de_spotify_silver.py:61-88); this is the distributional
  * screen that catches what range checks can't: a column whose values
  * are individually plausible but collectively synthetic.
  */
object Benford {

  /** log10(1 + 1/d) for d = 1..9, pre-rounded to 6 dp and inlined as
    * literals on BOTH engines. Computing log10 live would make the
    * report depend on two libm implementations agreeing to the last
    * ulp (Java Math.log10 vs DuckDB's C libm — neither correctly
    * rounded); a shared 6 dp literal grid makes every downstream
    * float a fixed-sequence expression of identical doubles. */
  val P6: Seq[Double] = Seq(0.301030, 0.176091, 0.124939, 0.096910,
    0.079181, 0.066947, 0.057992, 0.051153, 0.045757)

  /** §2.239 `benford_check`: per audited column and first significant
    * digit — observed count, share, Benford probability, deviation,
    * and the binomial z-score (obs − Np)/√(Np(1−p)). Audited columns:
    * lineitem.l_extendedprice (qty × unit price — should conform) and
    * orders.o_totalprice (sum of line amounts — should conform).
    *
    * Scale shape: ONE map-side-combined groupBy per column collapses
    * the corpus to ≤9 digit rows; everything after lives on that
    * 18-row frame (the totals join is a broadcast of 2 rows).
    *
    * Determinism: the first digit is taken from the DECIMAL STRING of
    * the exact integer cents — no log10/floor on doubles, where a
    * last-ulp disagreement at a power of 10 would flip the digit.
    * Counts are exact integers; share = n/N and the z-score are
    * fixed-sequence floats of identical integers and the [[P6]]
    * literals. */
  def benfordCheck(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(lit("lineitem.l_extendedprice").as("src"),
        col("l_extendedprice").as("x"))
    val od = Tables.orders(spark, dir)
      .select(lit("orders.o_totalprice").as("src"),
        col("o_totalprice").as("x"))
    val digits = li.unionAll(od)
      .withColumn("cents", round(col("x") * 100, 0).cast("long"))
      .filter(col("cents") > 0)
      .withColumn("digit",
        substring(col("cents").cast("string"), 1, 1).cast("int"))
      .groupBy("src", "digit").agg(count(lit(1)).as("n"))
    val totals = digits.groupBy("src").agg(sum("n").as("n_total"))
    val p = element_at(
      array(P6.map(lit): _*), col("digit")) // 1-indexed
    digits.join(broadcast(totals), Seq("src"))
      .withColumn("p", p)
      .withColumn("share", col("n").cast("double") / col("n_total"))
      .withColumn("np", col("n_total").cast("double") * col("p"))
      .select(col("src"), col("digit"), col("n"), col("n_total"),
        round(col("share"), 6).as("share"),
        col("p").as("benford_p"),
        round(col("share") - col("p"), 6).as("dev"),
        round((col("n").cast("double") - col("np")) /
          sqrt(col("np") * (lit(1.0) - col("p"))), 4).as("z"))
      .orderBy("src", "digit")
  }

  val benfordCheckSql: String = {
    val caseP = P6.zipWithIndex
      .map { case (p, i) => s"WHEN ${i + 1} THEN CAST($p AS DOUBLE)" }
      .mkString("CASE digit ", " ", " END")
    s"""WITH vals AS (
       |  SELECT 'lineitem.l_extendedprice' AS src,
       |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
       |  FROM lineitem
       |  UNION ALL
       |  SELECT 'orders.o_totalprice' AS src,
       |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
       |  FROM orders),
       |digits AS (SELECT src,
       |    CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS INTEGER)
       |      AS digit, count(*) AS n
       |  FROM vals WHERE cents > 0 GROUP BY 1, 2),
       |tot AS (SELECT src, CAST(sum(n) AS BIGINT) AS n_total
       |  FROM digits GROUP BY 1)
       |SELECT d.src, d.digit, d.n, t.n_total,
       |  round(CAST(d.n AS DOUBLE) / t.n_total, 6) AS share,
       |  $caseP AS benford_p,
       |  round(CAST(d.n AS DOUBLE) / t.n_total - ($caseP), 6) AS dev,
       |  round((CAST(d.n AS DOUBLE) - t.n_total * ($caseP))
       |    / sqrt(t.n_total * ($caseP) * (1.0 - ($caseP))), 4) AS z
       |FROM digits d JOIN tot t USING (src)
       |ORDER BY src, digit""".stripMargin
  }
}
