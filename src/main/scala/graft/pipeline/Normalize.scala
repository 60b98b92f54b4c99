package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Cross-source quantile normalization — SURVEY.md §2.282.
  */
object Normalize {

  /** §2.282 `quantile_normalize`: map each source's document-length
    * distribution onto the POOLED corpus distribution — for every
    * (source, n_chars) the pooled value at the same quantile
    * (percentile_disc convention: the smallest pooled value whose
    * ECDF reaches the source rank's). The corpus-mixing companion to
    * §2.75: per-source quality/length scores are not comparable until
    * their distributions are aligned, and quantile normalization is
    * the standard alignment (microarray lineage; feature scaling for
    * mixed-source training corpora).
    *
    * The quantile LOOKUP is a sort-merge, not a non-equi join: pooled
    * ECDF steps and source ranks land in ONE frame keyed by exact
    * integer cross-products (rank_src·n_pool vs cum_pool·n_src — the
    * float-free quantile comparison), and the answer is the first
    * pooled value at-or-after each source row in that order — one
    * per-source window pass over a value-grain-bounded frame.
    *
    * Scale shape: the corpus collapses to (source, value) and (value)
    * grains in two map-side-combined groupBys (the only corpus-sized
    * stages); everything after runs at value-grid grain (scores are
    * gridded in production — §2.224's bounded-cells argument), with
    * the pooled grid replicated per source (|grid|·|sources|, still
    * grid-bounded).
    *
    * Determinism: all comparisons are exact BIGINT products; no
    * float enters until... there is no float. */
  def quantileNormalize(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("source", "n_chars")
    // source ECDF at distinct-value grain: rank = rows with value ≤ v
    val src = docs.groupBy("source", "n_chars")
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("rank_src",
        sum("n_rows").over(Window.partitionBy("source").orderBy("n_chars")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val srcSizes = docs.groupBy("source").agg(count(lit(1)).as("n_src"))
    // pooled ECDF steps
    val pool = docs.groupBy("n_chars").agg(count(lit(1)).as("c"))
      .withColumn("cum_pool",
        sum("c").over(Window.orderBy("n_chars")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val nPool = docs.agg(count(lit(1)).as("n_pool"))
    // one merged frame per source: pooled steps keyed cum_pool·n_src,
    // source rows keyed rank_src·n_pool; kind orders source rows
    // FIRST at equal keys so ≥ matches see the step in their frame
    val poolRep = pool.crossJoin(broadcast(srcSizes))
      .select(col("source"), (col("cum_pool") * col("n_src")).as("mk"),
        lit(1L).as("kind"), col("n_chars").as("pool_v"),
        lit(null).cast("long").as("value"), lit(null).cast("long").as("n_rows"))
    val srcRows = src.crossJoin(broadcast(nPool))
      .select(col("source"), (col("rank_src") * col("n_pool")).as("mk"),
        lit(0L).as("kind"), lit(null).cast("long").as("pool_v"),
        col("n_chars").as("value"), col("n_rows"))
    val merged = poolRep.unionAll(srcRows)
    val wAfter = Window.partitionBy("source").orderBy("mk", "kind")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    merged
      .withColumn("q_value", first(col("pool_v"), ignoreNulls = true)
        .over(wAfter))
      .filter(col("kind") === 0L)
      .select(col("source"), col("value"), col("n_rows"), col("q_value"))
      .orderBy("source", "value")
  }

  val quantileNormalizeSql: String =
    s"""WITH docs AS (SELECT source, n_chars FROM documents),
       |src AS (SELECT source, n_chars, count(*) AS n_rows,
       |    CAST(sum(count(*)) OVER (PARTITION BY source ORDER BY n_chars
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS rank_src
       |  FROM docs GROUP BY 1, 2),
       |sizes AS (SELECT source, count(*) AS n_src FROM docs GROUP BY 1),
       |pool AS (SELECT n_chars,
       |    CAST(sum(count(*)) OVER (ORDER BY n_chars
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum_pool
       |  FROM docs GROUP BY 1),
       |np AS (SELECT count(*) AS n_pool FROM docs),
       |merged AS (
       |  SELECT s.source, p.cum_pool * s.n_src AS mk,
       |    CAST(1 AS BIGINT) AS kind, p.n_chars AS pool_v,
       |    CAST(NULL AS BIGINT) AS value, CAST(NULL AS BIGINT) AS n_rows
       |  FROM pool p CROSS JOIN sizes s
       |  UNION ALL
       |  SELECT src.source, src.rank_src * np.n_pool AS mk,
       |    CAST(0 AS BIGINT) AS kind, CAST(NULL AS BIGINT) AS pool_v,
       |    src.n_chars AS value, src.n_rows
       |  FROM src CROSS JOIN np),
       |looked AS (SELECT source, kind, value, n_rows,
       |    first_value(pool_v IGNORE NULLS) OVER (PARTITION BY source
       |      ORDER BY mk, kind
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS q_value
       |  FROM merged)
       |SELECT source, value, n_rows, q_value FROM looked
       |WHERE kind = 0 ORDER BY source, value""".stripMargin
}
