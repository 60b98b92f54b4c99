package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Silver-layer cleansing: imputation stats, imputation, clamping, dedup.
  *
  * Re-expresses the reference's silver transform
  * (/root/reference/dags/de_spotify_silver.py:49-72 `compute_medians_modes`
  * and /root/reference/dags/sql/de_spotify_silver.sql): median/mode
  * imputation, LEAST/GREATEST clamping, ROW_NUMBER dedup keep-first.
  *
  * Scale design:
  *  - Medians: ONE aggregation pass computing exact `median` for every
  *    numeric column simultaneously (the reference pulls the whole table
  *    into pandas). Result is a 1-row collect of scalars — O(cols), not
  *    O(rows) — then folded back in as literals, exactly like the
  *    reference's Jinja-templated constants, so the impute pass is pure
  *    codegen'd projection with no join.
  *  - Modes: per-column groupBy count with deterministic tie-break
  *    (max count, then min value). Each is a partial-agg'd shuffle over
  *    distinct values (small), never over rows.
  *  - Dedup keep-first: `min_by(struct(*), orderKey)` — a hash
  *    aggregation with map-side partial combine; scales linearly and
  *    avoids the full sort a window row_number would force. A window
  *    variant is provided for multi-column ordering.
  */
object Silver {

  /** Exact medians for the given numeric columns, one scan. */
  def medians(df: DataFrame, cols: Seq[String]): Map[String, Double] = {
    val aggs = cols.map(c => median(col(c)).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.map { case (c, i) => c -> row.getDouble(i) }.toMap
  }

  /** Medians + modes with the two stat jobs submitted CONCURRENTLY
    * (Spark schedules independent jobs in parallel; the two scans
    * overlap instead of serializing — the reference computes both in
    * one pandas pass on the driver, we do it in two overlapped
    * distributed passes). */
  def stats(df: DataFrame, numericCols: Seq[String],
      categoricalCols: Seq[String]): (Map[String, Double], Map[String, String]) = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fMed = Future(medians(df, numericCols))
    val fMod = Future(modes(df, categoricalCols))
    (Await.result(fMed, Duration.Inf), Await.result(fMod, Duration.Inf))
  }

  /** Approximate medians via a mergeable quantile sketch
    * (percentile_approx): the 100 TB path. Exact `median` buffers every
    * value per group during aggregation; the sketch is O(accuracy)
    * memory per partition and one partial-agg'd pass. Use exact for
    * oracle parity at test SF, approx in production imputation. */
  def mediansApprox(df: DataFrame, cols: Seq[String],
      accuracy: Int = 10000): Map[String, Double] = {
    val aggs = cols.map(c =>
      percentile_approx(col(c), lit(0.5), lit(accuracy)).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.map { case (c, i) => c -> row.getDouble(i) }.toMap
  }

  /** Deterministic mode (most frequent; ties → smallest value). */
  def mode(df: DataFrame, c: String): String =
    df.filter(col(c).isNotNull)
      .groupBy(col(c)).agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc(c))
      .limit(1).head().getString(0)

  /** Modes for ALL columns in one scan: unpivot to (col, value), count,
    * keep min value among max-count rows per col. Shuffles touch only
    * distinct (col, value) pairs — tiny — vs one full job per column in
    * the naive variant (the reference computes each in pandas). */
  def modes(df: DataFrame, cols: Seq[String]): Map[String, String] = {
    val counts = df.select(
      expr(s"stack(${cols.size}, ${cols.map(c => s"'$c', $c").mkString(", ")}) AS (_c, _v)"))
      .filter(col("_v").isNotNull)
      .groupBy("_c", "_v").agg(count(lit(1)).as("cnt"))
    val maxes = counts.groupBy("_c").agg(max("cnt").as("mx"))
      .withColumnRenamed("_c", "_mc")
    counts.join(maxes, col("_c") === col("_mc") && col("cnt") === col("mx"))
      .groupBy("_c").agg(min("_v").as("mode"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  /** LEAST(GREATEST(x, lo), hi) — the reference's clamp idiom. */
  def clamp(c: Column, lo: Double, hi: Double): Column =
    least(greatest(c, lit(lo)), lit(hi))

  /** COALESCE-impute nulls with precomputed per-column fill values. */
  def impute(df: DataFrame, fills: Map[String, Any]): DataFrame =
    fills.foldLeft(df) { case (d, (c, v)) =>
      d.withColumn(c, coalesce(col(c), lit(v)))
    }

  /** Dedup keep-first via min_by aggregation (single partial-agg'd
    * shuffle, no sort). `order` columns are compared lexicographically;
    * pass enough columns for a total order (determinism under ties). */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String], order: Seq[String]): DataFrame = {
    val all = struct(df.columns.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(min_by(all, struct(order.map(col): _*)).as("_row"))
      .select(df.columns.map(c => col(s"_row.$c")): _*)
  }

  /** Dedup keep-first via window row_number (general ordering). */
  def dedupKeepFirstWindow(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }
}
