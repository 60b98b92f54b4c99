package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.dq._

/** Driver-contract wiring for SURVEY.md §2 items 1–7 (medallion core).
  * Each query has a DuckDB oracle with identical column aliases. */
object EtlQueries {

  private val ts0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")

  /** §2.1 bronze ingest + lineage metadata (fixed ts for determinism). */
  def bronzeIngest(spark: SparkSession, dir: String): DataFrame =
    Bronze.withMetadata(Tables.documents(spark, dir), "PARQUET", "batch_001", ts0)
      .orderBy("doc_id")

  val bronzeIngestSql: String =
    """SELECT *, TIMESTAMP '2026-01-01 00:00:00' AS ingestion_timestamp,
      |  'PARQUET' AS source_identifier, 'batch_001' AS batch_identifier
      |FROM documents ORDER BY doc_id""".stripMargin

  /** §2.2 single-pass expectations suite over lineitem. */
  val lineitemSuite: Seq[Expectation] = Seq(
    NotNull("l_orderkey"), NotNull("l_quantity"), NotNull("l_returnflag"),
    Unique("l_orderkey"),
    CompoundUnique(Seq("l_orderkey", "l_linenumber")),
    Between("l_discount", 0.0, 0.1), Between("l_quantity", 0.0, 60.0),
    Between("l_tax", 0.0, 0.05), // corpus reaches 0.08 → red, with samples
    AggBetween("l_quantity", "min", 2.0, 100.0), // corpus min is 1 → red
    AggBetween("l_extendedprice", "max", 0.0, 200000.0), // green
    InSet("l_returnflag", Seq("A", "N", "R")),
    InSet("l_linestatus", Seq("O", "F")),
    TypeIs("l_orderkey", "bigint"), TypeIs("l_quantity", "double"),
    TypeIs("l_returnflag", "string"), TypeIs("l_shipdate", "timestamp"),
    TypeIs("l_linenumber", "bigint"), // actually int32 → flags all rows
    LengthBetween("l_returnflag", 1, 1), LengthBetween("l_linestatus", 1, 1),
    RowCountAtLeast(1))

  /** Failing-row samples keyed by l_orderkey — the GX
    * partial_unexpected_list analogue (same single aggregation pass). */
  def dqReport(spark: SparkSession, dir: String): DataFrame =
    Expectations.run(Tables.lineitem(spark, dir), lineitemSuite,
      sampleKey = Some("l_orderkey"))

  val dqReportSql: String =
    Expectations.oracleSql("lineitem", lineitemSuite, sampleKey = Some("l_orderkey"))

  private val liNumCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
  private val liCatCols = Seq("l_returnflag", "l_linestatus")

  /** Imputation stats computed ONCE per input dir and shared by every
    * consumer (`mediansModes` report AND `silverPipeline` imputation) —
    * the production shape: a single stats job feeds both the stats
    * report and the transform, instead of each entry re-scanning. */
  private val statsCache =
    new graft.MemoCache[(Map[String, Double], Map[String, String])](8)(_ => ())
  private def lineitemStats(spark: SparkSession, dir: String) =
    statsCache.getOrElseUpdate(spark, dir)(
      Silver.stats(Tables.lineitem(spark, dir), liNumCols, liCatCols))

  /** §2.3 imputation stats: exact medians + deterministic modes. */
  def mediansModes(spark: SparkSession, dir: String): DataFrame = {
    val (med, mod) = lineitemStats(spark, dir)
    spark.range(1).select(
      round(lit(med("l_quantity")), 6).as("median_qty"),
      round(lit(med("l_extendedprice")), 6).as("median_price"),
      round(lit(med("l_discount")), 6).as("median_disc"),
      round(lit(med("l_tax")), 6).as("median_tax"),
      lit(mod("l_returnflag")).as("mode_returnflag"),
      lit(mod("l_linestatus")).as("mode_linestatus"))
  }

  val mediansModesSql: String =
    """SELECT
      |  (SELECT round(median(l_quantity), 6) FROM lineitem) AS median_qty,
      |  (SELECT round(median(l_extendedprice), 6) FROM lineitem) AS median_price,
      |  (SELECT round(median(l_discount), 6) FROM lineitem) AS median_disc,
      |  (SELECT round(median(l_tax), 6) FROM lineitem) AS median_tax,
      |  (SELECT l_returnflag FROM (SELECT l_returnflag, count(*) AS c FROM lineitem
      |     GROUP BY 1 ORDER BY c DESC, l_returnflag LIMIT 1)) AS mode_returnflag,
      |  (SELECT l_linestatus FROM (SELECT l_linestatus, count(*) AS c FROM lineitem
      |     GROUP BY 1 ORDER BY c DESC, l_linestatus LIMIT 1)) AS mode_linestatus""".stripMargin

  private val liCols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "l_returnflag", "l_linestatus", "l_shipdate")

  /** Total-order tie-break for keep-first dedup: l_linenumber first
    * (the reference's ORDER BY `index`), then every remaining column —
    * (l_orderkey, l_linenumber) is not unique in the corpus. */
  private val liDedupOrder = Seq("l_linenumber", "l_partkey", "l_suppkey",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "l_returnflag", "l_linestatus", "l_shipdate")

  /** §2.4 dedup keep-first by key (min_by agg — no sort, partial agg). */
  def silverDedup(spark: SparkSession, dir: String): DataFrame =
    Silver.dedupKeepFirst(Tables.lineitem(spark, dir), Seq("l_orderkey"), liDedupOrder)
      .orderBy("l_orderkey")

  val silverDedupSql: String =
    s"""SELECT ${liCols.mkString(", ")} FROM (
       |  SELECT *, row_number() OVER (PARTITION BY l_orderkey
       |    ORDER BY ${liDedupOrder.mkString(", ")}) AS rn
       |  FROM lineitem) t WHERE rn = 1 ORDER BY l_orderkey""".stripMargin

  /** §2.5 full silver transform: dedup + impute(median/mode) + clamp —
    * the reference's de_spotify_silver.sql re-expressed. Stats come from
    * the full (pre-dedup) table, as in the reference. */
  def silverPipeline(spark: SparkSession, dir: String): DataFrame = {
    val (med, mod) = lineitemStats(spark, dir)
    silverPipelineWith(spark, dir, med, mod)
  }

  /** 100-TB variant: imputation fills from the mergeable quantile
    * sketch ([[Silver.mediansApprox]]) instead of exact `median` (which
    * buffers all values per agg buffer). Same transform otherwise;
    * EtlSpec asserts agreement with the exact pipeline within sketch
    * tolerance. Not oracle-checked (DuckDB's median is exact). */
  def silverPipelineApprox(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val med = Silver.mediansApprox(li, liNumCols)
    val mod = Silver.modes(li, liCatCols)
    silverPipelineWith(spark, dir, med, mod)
  }

  private def silverPipelineWith(spark: SparkSession, dir: String,
      med: Map[String, Double], mod: Map[String, String]): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val deduped = Silver.dedupKeepFirst(li, Seq("l_orderkey"), liDedupOrder)
    val imputed = Silver.impute(deduped,
      Map("l_quantity" -> med("l_quantity"), "l_extendedprice" -> med("l_extendedprice"),
          "l_discount" -> med("l_discount"), "l_tax" -> med("l_tax"),
          "l_returnflag" -> mod("l_returnflag"), "l_linestatus" -> mod("l_linestatus")))
    imputed.select(
      col("l_orderkey"), col("l_linenumber"),
      Silver.clamp(col("l_quantity"), 2.0, 45.0).as("l_quantity"),
      col("l_extendedprice"),
      Silver.clamp(col("l_discount"), 0.0, 0.05).as("l_discount"),
      Silver.clamp(col("l_tax"), 0.0, 0.07).as("l_tax"),
      col("l_returnflag"), col("l_linestatus"))
      .orderBy("l_orderkey")
  }

  val silverPipelineSql: String =
    """WITH stats AS (
      |  SELECT median(l_quantity) AS m_qty, median(l_extendedprice) AS m_price,
      |         median(l_discount) AS m_disc, median(l_tax) AS m_tax,
      |         (SELECT l_returnflag FROM (SELECT l_returnflag, count(*) AS c FROM lineitem
      |            GROUP BY 1 ORDER BY c DESC, l_returnflag LIMIT 1)) AS mo_rf,
      |         (SELECT l_linestatus FROM (SELECT l_linestatus, count(*) AS c FROM lineitem
      |            GROUP BY 1 ORDER BY c DESC, l_linestatus LIMIT 1)) AS mo_ls
      |  FROM lineitem),
      |dedup AS (
      |  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
      |    ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice,
      |      l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate) AS rn
      |  FROM lineitem) t WHERE rn = 1)
      |SELECT l_orderkey, l_linenumber,
      |  LEAST(GREATEST(coalesce(l_quantity, m_qty), 2.0), 45.0) AS l_quantity,
      |  coalesce(l_extendedprice, m_price) AS l_extendedprice,
      |  LEAST(GREATEST(coalesce(l_discount, m_disc), 0.0), 0.05) AS l_discount,
      |  LEAST(GREATEST(coalesce(l_tax, m_tax), 0.0), 0.07) AS l_tax,
      |  coalesce(l_returnflag, mo_rf) AS l_returnflag,
      |  coalesce(l_linestatus, mo_ls) AS l_linestatus
      |FROM dedup, stats ORDER BY l_orderkey""".stripMargin

  /** §2.6 incremental load: latest-wins upsert of an update batch. */
  def incrementalUpsert(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val base = orders.withColumn("_version", lit(1))
    val updates = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      .withColumn("o_orderpriority", lit("URGENT-UPDATE"))
      .withColumn("_version", lit(2))
    Loader.upsert(base, updates, Seq("o_orderkey"), "_version")
      .drop("_version").orderBy("o_orderkey")
  }

  val incrementalUpsertSql: String =
    """WITH base AS (SELECT *, 1 AS _version, 0 AS _src FROM orders),
      |updates AS (SELECT o_orderkey, o_custkey, o_orderstatus,
      |    o_totalprice + 1000.0 AS o_totalprice, o_orderdate,
      |    'URGENT-UPDATE' AS o_orderpriority, 2 AS _version, 1 AS _src
      |  FROM orders WHERE o_orderkey % 10 = 0),
      |unioned AS (SELECT * FROM base UNION ALL SELECT * FROM updates)
      |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      |FROM (SELECT *, row_number() OVER (PARTITION BY o_orderkey
      |  ORDER BY _version DESC, _src DESC) AS rn FROM unioned) t
      |WHERE rn = 1 ORDER BY o_orderkey""".stripMargin

  /** §2.134 SCD Type-2 history construction — the dimension-load
    * semantic §2.6's latest-wins upsert does NOT cover: instead of
    * overwriting, every attribute change opens a new versioned row
    * with a validity interval, so any past state can be joined
    * as-of-then (the warehouse pattern the reference's MySQL
    * dimension loads would grow into; the Kimball SCD2 shape).
    *
    * The change stream is events per user under the (ts, event_id)
    * total order (the §2.98 funnel convention); the tracked attribute
    * is event_type ("status"). Consecutive same-status updates
    * COLLAPSE (a re-assertion of the current value is not a new
    * version — the defining SCD2 rule, and gaps-and-islands again:
    * lag ≠ current opens a version); valid_from = first ts of the
    * run, valid_to = next version's valid_from (half-open, NULL on
    * the current version), version = per-user ordinal.
    *
    * Scale shape: ONE hash exchange on user_id feeds every window
    * (lag → filter → row_number → lead all share the same partition
    * ordering — one sort, no extra shuffle), then per-user work is
    * linear. A hot user is one sorted run; the output is
    * change-sized, not event-sized. */
  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val changes = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("status"))
      .withColumn("prev", lag("status", 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("status"))
    val wv = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes
      .withColumn("version", row_number().over(wv))
      .withColumn("valid_to", lead("ts", 1).over(wv))
      .select(col("user_id"), col("version"), col("status"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy("user_id", "version")
  }

  val scd2HistorySql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
      |    event_type AS status FROM events),
      |ch AS (SELECT * FROM (SELECT user_id, ts, event_id, status,
      |    lag(status) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM e) t WHERE prev IS NULL OR prev <> status)
      |SELECT user_id,
      |  CAST(row_number() OVER w AS INT) AS version,
      |  status, ts AS valid_from,
      |  lead(ts) OVER w AS valid_to,
      |  lead(ts) OVER w IS NULL AS is_current
      |FROM ch
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, version""".stripMargin

  /** §2.7 load report: per-group row counts + key/ts stats. */
  def loadReport(spark: SparkSession, dir: String): DataFrame =
    Loader.report(Tables.events(spark, dir), Seq("event_type"), "user_id", "ts")

  val loadReportSql: String =
    """SELECT event_type, count(*) AS rows_loaded,
      |  count(DISTINCT user_id) AS distinct_keys,
      |  min(ts) AS min_ts, max(ts) AS max_ts
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** §2.319 `gold_rollup`: the gold-layer materialization the
    * reference's medallion stops short of ("no Gold layer" —
    * /root/reference/README.md §5 dashboards aggregate silver live):
    * per (event_type, day) event count, exact revenue cents, and the
    * derived average. This batch definition IS the contract for
    * [[graft.streaming.Streaming.goldIncrementalStream]] — the
    * foreachBatch-maintained incremental twin must equal this
    * recompute after any micro-batch prefix (spec-pinned, including
    * across a restart and a replayed batch).
    *
    * Scale shape: one map-side-combined groupBy; output is bounded by
    * |event types| × calendar days, not the corpus.
    *
    * Determinism: counts/cents exact BIGINTs; avg_value is ONE
    * division of identical integers rounded 6 dp. */
  def goldRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("value_cents"))
      .select(col("event_type"), col("day"), col("n_events"),
        col("value_cents"),
        round(col("value_cents").cast("double") / 100.0 / col("n_events"), 6)
          .as("avg_value"))
      .orderBy("event_type", "day")

  val goldRollupSql: String =
    """SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
      |  round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
      |    / 100.0 / count(*), 6) AS avg_value
      |FROM events GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin
}
