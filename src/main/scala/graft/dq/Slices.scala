package graft.dq

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Slice-level outcome audit — SURVEY.md §2.243.
  *
  * The model-debugging question behind SliceFinder/SliceLine (Chung
  * et al. 2019, Sagadeeva & Boehm 2021): aggregate metrics hide
  * slices where the data (or a model trained on it) misbehaves. The
  * cheap first pass every eval pipeline wants: for each value of each
  * low-cardinality dimension, compare the slice's outcome rate to the
  * global rate with a per-slice z-score.
  */
object Slices {

  /** §2.243 `slice_metrics`: outcome = the `error` event share. For
    * every slice of three dimensions — day-of-week, 6-hour band, and
    * item decile — report n, outcome count, rate, global rate, lift,
    * and the one-sample two-proportion z
    * (p̂ − p₀)/√(p₀(1−p₀)/n).
    *
    * Scale shape: each event emits its 3 (dim, slice) memberships via
    * a compiled `stack` (one corpus scan, 3× fan-out — bounded, not
    * data-squared), then ONE map-side-combined groupBy to the ≤21
    * slice rows; the global rate is a 1-row broadcast.
    *
    * Determinism: all counts exact integers; rate/lift/z are
    * fixed-sequence floats of identical integers, rounded once. */
  def sliceMetrics(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("item", get_json_object(col("props"), "$.k").cast("int"))
      .filter(col("item").isNotNull)
      .select(
        (col("event_type") === "error").cast("long").as("is_err"),
        dayofweek(col("ts")).cast("string").as("dow"),
        concat(lit("h"), (floor(hour(col("ts")) / 6) * 6).cast("string"))
          .as("hour_band"),
        floor(col("item") / 10).cast("string").as("item_decile"))
    val slices = ev.select(col("is_err"), expr(
      "stack(3, 'dow', dow, 'hour_band', hour_band, " +
        "'item_decile', item_decile) AS (dim, slice)"))
      .groupBy("dim", "slice")
      .agg(count(lit(1)).as("n"), sum("is_err").as("n_err"))
    val glob = slices.filter(col("dim") === "dow")
      .agg(sum("n").as("n_tot"), sum("n_err").as("err_tot"))
    val p0 = col("err_tot").cast("double") / col("n_tot")
    val p = col("n_err").cast("double") / col("n")
    slices.crossJoin(broadcast(glob))
      .select(col("dim"), col("slice"), col("n"), col("n_err"),
        round(p, 6).as("rate"),
        round(p0, 6).as("global_rate"),
        round(p / p0, 4).as("lift"),
        round((p - p0) / sqrt(p0 * (lit(1.0) - p0) / col("n").cast("double")),
          4).as("z"))
      .orderBy("dim", "slice")
  }

  val sliceMetricsSql: String =
    """WITH ev AS (SELECT
      |    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err,
      |    CAST(dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS VARCHAR) AS dow,
      |    'h' || CAST(CAST(floor(extract(hour FROM CAST(ts AS TIMESTAMP)) / 6)
      |      * 6 AS BIGINT) AS VARCHAR) AS hour_band,
      |    CAST(CAST(floor(CAST(json_extract_string(props, '$.k')
      |      AS INTEGER) / 10) AS BIGINT) AS VARCHAR) AS item_decile
      |  FROM events
      |  WHERE json_extract_string(props, '$.k') IS NOT NULL),
      |slices AS (
      |  SELECT dim, slice, count(*) AS n,
      |    CAST(sum(is_err) AS BIGINT) AS n_err
      |  FROM (SELECT is_err, 'dow' AS dim, dow AS slice FROM ev
      |    UNION ALL SELECT is_err, 'hour_band', hour_band FROM ev
      |    UNION ALL SELECT is_err, 'item_decile', item_decile FROM ev)
      |  GROUP BY 1, 2),
      |gtot AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot,
      |    CAST(sum(n_err) AS BIGINT) AS err_tot
      |  FROM slices WHERE dim = 'dow')
      |SELECT dim, slice, n, n_err,
      |  round(CAST(n_err AS DOUBLE) / n, 6) AS rate,
      |  round(CAST(err_tot AS DOUBLE) / n_tot, 6) AS global_rate,
      |  round((CAST(n_err AS DOUBLE) / n)
      |    / (CAST(err_tot AS DOUBLE) / n_tot), 4) AS lift,
      |  round((CAST(n_err AS DOUBLE) / n - CAST(err_tot AS DOUBLE) / n_tot)
      |    / sqrt((CAST(err_tot AS DOUBLE) / n_tot)
      |      * (1.0 - CAST(err_tot AS DOUBLE) / n_tot) / n), 4) AS z
      |FROM slices CROSS JOIN gtot
      |ORDER BY dim, slice""".stripMargin
}
