package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** RFM customer segmentation — SURVEY.md §2.141. */
object Rfm {

  /** §2.141 RFM segmentation: per customer recency (days since last
    * order, against the corpus's max date — deterministic, no
    * wall-clock), frequency (order count), monetary (revenue), each
    * scored 1–4 against the EXACT quartile boundaries of the
    * customer population, then rolled up to segment cells — the
    * classic CRM slicing (segment 444 = best customers) and the
    * warehouse-side feature build for churn models.
    *
    * Scale shape: the fact table collapses to the customer-grain
    * frame in ONE map-side-combined groupBy (the only corpus-sized
    * shuffle); quartile boundaries are one 9-value aggregate over
    * that dim-sized frame, broadcast back as a 1-row cross join (the
    * §2.81 winsorize pattern, one level up the aggregation tree);
    * scoring is row-local arithmetic and the final rollup is bounded
    * by 4³ cells. Nothing re-sorts and no window touches the fact
    * table — scoring against broadcast boundaries replaces the global
    * ntile a naive RFM would use (a single-partition window over ALL
    * customers — the №1 RFM scale trap). Boundary comparisons use
    * the unrounded interpolated quartiles (identical IEEE both
    * engines, the §2.15/2.81 precedent); monetary is carried as
    * EXACT integer cents end-to-end (each price → BIGINT cents
    * before ANY sum), so neither the per-customer totals, the
    * quartile boundaries, nor the per-segment averages depend on
    * float summation order — the r07 local gate caught one segment's
    * avg_monetary straddling its 4 dp rounding boundary under a
    * different partition count when the sums were double. */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(max("o_orderdate").as("last_order"),
        count(lit(1)).as("frequency"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
          .as("m_cents"))
      .withColumn("monetary", col("m_cents").cast("double") / 100.0)
    val maxDate = Tables.orders(spark, dir)
      .agg(max("o_orderdate").as("corpus_max"))
    val rfm = per.crossJoin(broadcast(maxDate))
      .withColumn("recency", datediff(col("corpus_max"), col("last_order")))
    val bounds = rfm.agg(
      expr("percentile(recency, 0.25)").as("r1"),
      expr("percentile(recency, 0.5)").as("r2"),
      expr("percentile(recency, 0.75)").as("r3"),
      expr("percentile(frequency, 0.25)").as("f1"),
      expr("percentile(frequency, 0.5)").as("f2"),
      expr("percentile(frequency, 0.75)").as("f3"),
      expr("percentile(monetary, 0.25)").as("m1"),
      expr("percentile(monetary, 0.5)").as("m2"),
      expr("percentile(monetary, 0.75)").as("m3"))
    def score(c: String, q1: String, q2: String, q3: String) =
      lit(1) + (col(c) > col(q1)).cast("int") +
        (col(c) > col(q2)).cast("int") + (col(c) > col(q3)).cast("int")
    rfm.crossJoin(broadcast(bounds))
      // recency: smaller = better, so invert the ascending score
      .withColumn("r_score", lit(5) - score("recency", "r1", "r2", "r3"))
      .withColumn("f_score", score("frequency", "f1", "f2", "f3"))
      .withColumn("m_score", score("monetary", "m1", "m2", "m3"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"),
        round(avg("recency"), 4).as("avg_recency"),
        round(avg("frequency"), 4).as("avg_frequency"),
        // exact BIGINT cent sum → one identical division per engine
        round(sum("m_cents").cast("double") / 100.0 /
          count(lit(1)), 4).as("avg_monetary"))
      .orderBy("r_score", "f_score", "m_score")
  }

  val rfmSegmentsSql: String =
    """WITH per AS (SELECT o_custkey, max(o_orderdate) AS last_order,
      |    count(*) AS frequency,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS m_cents,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
      |      / 100.0 AS monetary
      |  FROM orders GROUP BY 1),
      |mx AS (SELECT max(o_orderdate) AS corpus_max FROM orders),
      |rfm AS (SELECT o_custkey, frequency, monetary, m_cents,
      |    date_diff('day', last_order, corpus_max) AS recency
      |  FROM per CROSS JOIN mx),
      |b AS (SELECT
      |    quantile_cont(recency, 0.25) AS r1, quantile_cont(recency, 0.5) AS r2,
      |    quantile_cont(recency, 0.75) AS r3,
      |    quantile_cont(frequency, 0.25) AS f1, quantile_cont(frequency, 0.5) AS f2,
      |    quantile_cont(frequency, 0.75) AS f3,
      |    quantile_cont(monetary, 0.25) AS m1, quantile_cont(monetary, 0.5) AS m2,
      |    quantile_cont(monetary, 0.75) AS m3
      |  FROM rfm),
      |scored AS (SELECT recency, frequency, monetary, m_cents,
      |    5 - (1 + CAST(recency > r1 AS INT) + CAST(recency > r2 AS INT)
      |      + CAST(recency > r3 AS INT)) AS r_score,
      |    1 + CAST(frequency > f1 AS INT) + CAST(frequency > f2 AS INT)
      |      + CAST(frequency > f3 AS INT) AS f_score,
      |    1 + CAST(monetary > m1 AS INT) + CAST(monetary > m2 AS INT)
      |      + CAST(monetary > m3 AS INT) AS m_score
      |  FROM rfm CROSS JOIN b)
      |SELECT r_score, f_score, m_score, count(*) AS n_customers,
      |  round(avg(recency), 4) AS avg_recency,
      |  round(avg(frequency), 4) AS avg_frequency,
      |  round(CAST(sum(m_cents) AS DOUBLE) / 100.0 / count(*), 4)
      |    AS avg_monetary
      |FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
}
