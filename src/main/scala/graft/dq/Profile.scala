package graft.dq

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.207 one-pass multi-column data profiling (`hll_profile`): per
  * column of the events table — row count, null count, HLL approximate
  * distinct, exact distinct — the schema-wide cardinality fingerprint
  * a 100 TB ingest runs FIRST (join-key viability, id-ness of a
  * column, enum-ness of a category all fall out of it).
  *
  * The scale shape is the point: profiling N columns naively is N
  * `count(DISTINCT …)` scans; here the columns UNPIVOT inside one scan
  * (stack ×5 on the projected frame — a row multiplier on extracted
  * values, the text/bytes are never duplicated) and every statistic is
  * a mergeable aggregate of the (col_name, value) stream, so the whole
  * profile is ONE map-side-combined groupBy over ≤|columns| groups.
  * The exact distinct rides along for the oracle comparison; the
  * production path at scale keeps only the 4 KB-per-column HLL
  * (`approx_distinct`), which merges across partitions, days, and
  * shards for free ([[graft.functions.HllRegisters]]).
  *
  * Values are canonicalized to strings before hashing; `value` goes
  * through DECIMAL(18,2) so both engines print identical fixed-point
  * text (raw double→string formatting is engine-specific). */
object Profile {

  def hllProfile(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.HllSketch.hll_sketch
    import graft.text.TextFunctions.hash64
    val ev = Tables.events(spark, dir).select(
      col("event_id").cast("string").as("c_event_id"),
      col("user_id").cast("string").as("c_user_id"),
      col("event_type").as("c_event_type"),
      col("value").cast("decimal(18,2)").cast("string").as("c_value"),
      get_json_object(col("props"), "$.k").as("c_item"))
    ev.select(expr(
      """stack(5, 'event_id', c_event_id, 'user_id', c_user_id,
        |'event_type', c_event_type, 'value', c_value, 'item', c_item)
        |AS (col_name, v)""".stripMargin))
      .groupBy("col_name")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulls"),
        round(hll_sketch(hash64(col("v"))), 4).as("approx_distinct"),
        countDistinct(col("v")).as("exact_distinct"))
      .withColumn("err_pct",
        round((col("approx_distinct") - col("exact_distinct")) * 100.0 /
          col("exact_distinct"), 4))
      .orderBy("col_name")
  }

  val hllProfileSql: String = {
    import graft.text.TextFunctions.hash64Sql
    import graft.functions.HllSketch.{M, P, WindowBits, ScalePow}
    s"""WITH ev AS (SELECT CAST(event_id AS VARCHAR) AS c_event_id,
       |    CAST(user_id AS VARCHAR) AS c_user_id,
       |    event_type AS c_event_type,
       |    CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS c_value,
       |    json_extract_string(props, '$$.k') AS c_item
       |  FROM events),
       |stacked AS (
       |  SELECT 'event_id' AS col_name, c_event_id AS v FROM ev
       |  UNION ALL SELECT 'user_id', c_user_id FROM ev
       |  UNION ALL SELECT 'event_type', c_event_type FROM ev
       |  UNION ALL SELECT 'value', c_value FROM ev
       |  UNION ALL SELECT 'item', c_item FROM ev),
       |hv AS (SELECT col_name, ${hash64Sql("v")} AS h
       |  FROM stacked WHERE v IS NOT NULL),
       |r AS (SELECT col_name, h & ${M - 1} AS bucket,
       |    CASE WHEN (h >> $P) = 0 THEN ${WindowBits + 1}
       |         ELSE $WindowBits - length(bin((h >> $P)::BIGINT)) + 1
       |    END AS rho
       |  FROM hv),
       |reg AS (SELECT col_name, bucket, max(rho) AS mr FROM r GROUP BY 1, 2),
       |agg AS (SELECT col_name,
       |    CAST(sum((1::BIGINT) << ($ScalePow - mr)) AS BIGINT)
       |      + ($M - count(*)) * ((1::BIGINT) << $ScalePow) AS ssum,
       |    $M - count(*) AS zeros
       |  FROM reg GROUP BY 1),
       |est AS (SELECT col_name,
       |    (0.7213 / (1.0 + 1.079 / $M)) * $M * $M * ((1::BIGINT) << $ScalePow)
       |      / CAST(ssum AS DOUBLE) AS e_raw, zeros
       |  FROM agg),
       |x AS (SELECT col_name,
       |    round(CASE WHEN e_raw <= 2.5 * $M AND zeros > 0
       |      THEN $M * ln(CAST($M AS DOUBLE) / zeros)
       |      ELSE e_raw END, 4) AS approx_distinct
       |  FROM est),
       |base AS (SELECT col_name, count(*) AS n_rows,
       |    CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       |    count(DISTINCT v) AS exact_distinct
       |  FROM stacked GROUP BY 1)
       |SELECT b.col_name, b.n_rows, b.n_nulls, x.approx_distinct,
       |  b.exact_distinct,
       |  round((x.approx_distinct - b.exact_distinct) * 100.0 /
       |    b.exact_distinct, 4) AS err_pct
       |FROM base b JOIN x USING (col_name)
       |ORDER BY b.col_name""".stripMargin
  }
}
