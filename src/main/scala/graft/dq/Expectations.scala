package graft.dq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GX-lite: a Spark-native data-quality/expectations engine.
  *
  * Re-expresses the reference's Great Expectations suites
  * (/root/reference/dags/de_spotify_to_bronze.py:233-333 and
  * de_spotify_silver.py:96-204): not-null, unique, compound-unique,
  * between-range, in-set, row-count expectations.
  *
  * Scale design: GX evaluates each expectation as its own query; here
  * ALL expectations compile into Column aggregates evaluated in ONE
  * map-side-combinable aggregation pass over the table — a single scan
  * and a single 1-row shuffle regardless of suite size. The 1-row agg
  * result is then unpivoted into a (expectation, column, violations,
  * passed) report.
  */
sealed trait Expectation {
  /** Aggregate expression counting violating rows. */
  def violations: Column
  /** Schema-aware variant (default: schema-independent). */
  def violationsFor(df: DataFrame): Column = violations
  def name: String
  def column: String
  /** DuckDB-SQL rendering of `violations` (for the oracle). */
  def sql: String
  /** Per-ROW violation predicate, for expectations defined row-wise
    * (None for table/aggregate-level expectations like Unique or
    * RowCountAtLeast — GX likewise reports no unexpected list there).
    * Drives the `sample_keys` column: example offending keys, the GX
    * partial_unexpected_list analogue. */
  def rowViolates: Option[Column] = None
  /** DuckDB-SQL rendering of `rowViolates`. */
  def rowViolatesSql: Option[String] = None
}

final case class NotNull(column: String) extends Expectation {
  val name = "not_null"
  def violations: Column = count(lit(1)) - count(col(column))
  def sql = s"count(*) - count($column)"
  override def rowViolates: Option[Column] = Some(col(column).isNull)
  override def rowViolatesSql: Option[String] = Some(s"$column IS NULL")
}

final case class Unique(column: String) extends Expectation {
  val name = "unique"
  def violations: Column = count(col(column)) - countDistinct(col(column))
  def sql = s"count($column) - count(DISTINCT $column)"
}

final case class CompoundUnique(columns: Seq[String]) extends Expectation {
  val name = "compound_unique"
  val column: String = columns.mkString("+")
  def violations: Column =
    count(lit(1)) - countDistinct(col(columns.head), columns.tail.map(col): _*)
  def sql = s"count(*) - count(DISTINCT (${columns.mkString(", ")}))"
}

final case class Between(column: String, lo: Double, hi: Double) extends Expectation {
  val name = "between"
  def violations: Column =
    sum(when(col(column) < lo || col(column) > hi, 1L).otherwise(0L))
  def sql = s"coalesce(sum(CASE WHEN $column < $lo OR $column > $hi THEN 1 ELSE 0 END), 0)"
  override def rowViolates: Option[Column] = Some(col(column) < lo || col(column) > hi)
  override def rowViolatesSql: Option[String] = Some(s"($column < $lo OR $column > $hi)")
}

final case class InSet(column: String, values: Seq[String]) extends Expectation {
  val name = "in_set"
  private def vs = values.map(v => s"'$v'").mkString(", ")
  def violations: Column =
    sum(when(!col(column).isin(values: _*), 1L).otherwise(0L))
  def sql =
    s"coalesce(sum(CASE WHEN $column NOT IN ($vs) THEN 1 ELSE 0 END), 0)"
  override def rowViolates: Option[Column] = Some(!col(column).isin(values: _*))
  override def rowViolatesSql: Option[String] = Some(s"$column NOT IN ($vs)")
}

/** Schema-level type expectation (the reference's
  * ExpectColumnValuesToBeOfType): resolved against the DataFrame schema
  * at plan time on the Spark side, against typeof() in the oracle.
  * `typeName` is canonical: bigint|int|double|string|timestamp. */
final case class TypeIs(column: String, typeName: String) extends Expectation {
  import org.apache.spark.sql.types._
  val name = "type_is"
  private val sparkTypes: Map[String, Seq[DataType]] = Map(
    "bigint" -> Seq(LongType), "int" -> Seq(IntegerType),
    "double" -> Seq(DoubleType), "string" -> Seq(StringType),
    // parquet stores both adjusted and non-adjusted timestamps; DuckDB
    // calls both TIMESTAMP, Spark splits them into LTZ/NTZ
    "timestamp" -> Seq(TimestampType, TimestampNTZType))
  private val duckTypes: Map[String, String] = Map(
    "bigint" -> "BIGINT", "int" -> "INTEGER", "double" -> "DOUBLE",
    "string" -> "VARCHAR", "timestamp" -> "TIMESTAMP")
  def violations: Column = lit(0L) // overridden via violationsFor
  override def violationsFor(df: DataFrame): Column =
    if (sparkTypes(typeName).contains(df.schema(column).dataType)) lit(0L)
    else count(lit(1))
  def sql =
    s"CASE WHEN typeof(any_value($column)) = '${duckTypes(typeName)}' THEN 0 ELSE count(*) END"
}

/** Aggregate-bound expectation (GX's ExpectColumnMin/MaxToBeBetween):
  * passes iff agg(column) ∈ [lo, hi]. Aggregate-level → no row
  * samples, like Unique. `agg` is "min" or "max". */
final case class AggBetween(column: String, agg: String, lo: Double, hi: Double)
    extends Expectation {
  require(agg == "min" || agg == "max", s"unsupported agg: $agg")
  val name = s"${agg}_between"
  private def aggCol: Column =
    if (agg == "min") min(col(column)) else max(col(column))
  def violations: Column =
    when(aggCol >= lo && aggCol <= hi, 0L).otherwise(1L)
  def sql =
    s"CASE WHEN $agg($column) >= $lo AND $agg($column) <= $hi THEN 0 ELSE 1 END"
}

final case class RowCountAtLeast(minRows: Long) extends Expectation {
  val name = "row_count_at_least"
  val column = "*"
  def violations: Column = when(count(lit(1)) >= minRows, 0L).otherwise(1L)
  def sql = s"CASE WHEN count(*) >= $minRows THEN 0 ELSE 1 END"
}

/** The reference's ExpectTableRowCountToEqual. */
final case class RowCountEquals(rows: Long) extends Expectation {
  val name = "row_count_equals"
  val column = "*"
  def violations: Column = when(count(lit(1)) === rows, 0L).otherwise(1L)
  def sql = s"CASE WHEN count(*) = $rows THEN 0 ELSE 1 END"
}

/** The reference's ExpectColumnValueLengthsToBeBetween. */
final case class LengthBetween(column: String, lo: Int, hi: Int) extends Expectation {
  val name = "length_between"
  def violations: Column =
    sum(when(length(col(column)) < lo || length(col(column)) > hi, 1L).otherwise(0L))
  def sql =
    s"coalesce(sum(CASE WHEN length($column) < $lo OR length($column) > $hi THEN 1 ELSE 0 END), 0)"
  override def rowViolates: Option[Column] =
    Some(length(col(column)) < lo || length(col(column)) > hi)
  override def rowViolatesSql: Option[String] =
    Some(s"(length($column) < $lo OR length($column) > $hi)")
}

object Expectations {

  /** Evaluate a suite in one aggregation pass; returns the DQ report
    * DataFrame (expectation, column, violations, passed[, sample_keys]).
    *
    * `sampleKey`: when set, each ROW-level expectation also reports up
    * to `sampleN` example offending keys (the reference GX results'
    * partial_unexpected_list — de_spotify_to_bronze.py validation
    * suite) as a deterministic comma-joined string: the `sampleN`
    * smallest DISTINCT violating keys, via the O(k)-state mergeable
    * [[graft.functions.MinKStrings]] aggregate (collect_set would
    * buffer every distinct violator — unbounded at corpus scale).
    * The samples run as their OWN single-group aggregation pass,
    * cross-joined with the 1-row counts: the Unique/CompoundUnique
    * countDistinct aggs plan an Expand (one row copy per distinct
    * group), and putting object-state aggregates on that multiplied
    * input degrades ObjectHashAggregate to sort-based fallback
    * (measured: 2.4 s → 76 s at sf0.1). Aggregate-level expectations
    * (unique, row-count, type) report '' — GX likewise has no
    * unexpected list for table-level expectations. */
  def run(df: DataFrame, suite: Seq[Expectation],
      sampleKey: Option[String] = None, sampleN: Int = 5): DataFrame = {
    // Unique/CompoundUnique leave the one-pass agg: countDistinct plans
    // an Expand (row × (1 + n distinct groups) — 3× the corpus through
    // one aggregation with interleaved distinct-key hash maps; measured
    // 12.7 s of dq_report's sf1 cost). Each runs instead as its own
    // two-level aggregation — groupBy(keys).count then a 1-row rollup —
    // compact partial-agg'd shuffles of (key, count) pairs, no row
    // multiplication, same exact counts (crossJoined back below).
    val isDistinctExp: Expectation => Boolean =
      { case _: Unique | _: CompoundUnique => true; case _ => false }
    val vAggs = suite.zipWithIndex.collect { case (e, i) if !isDistinctExp(e) =>
      e.violationsFor(df).cast("long").as(s"v$i")
    }
    val distinctFrames = suite.zipWithIndex.collect { case (e, i) if isDistinctExp(e) =>
      val keys = e match {
        case Unique(c) => Seq(c)
        case CompoundUnique(cs) => cs
        case _ => Seq.empty
      }
      val allNN = keys.map(col(_).isNotNull).reduce(_ && _)
      val g = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_cnt"))
      // Unique counts non-null rows minus distinct non-null values;
      // CompoundUnique counts ALL rows minus distinct non-null tuples
      // (countDistinct semantics, mirrored exactly)
      val v = e match {
        case _: Unique => sum(when(allNN, col("_cnt"))) - count(when(allNN, lit(1)))
        case _ => sum(col("_cnt")) - count(when(allNN, lit(1)))
      }
      g.agg(coalesce(v, lit(0L)).cast("long").as(s"v$i"))
    }
    val kAggs = sampleKey.toSeq.flatMap { key =>
      suite.zipWithIndex.map { case (e, i) =>
        e.rowViolates match {
          case Some(pred) =>
            concat_ws(",", graft.functions.MinKStrings.min_k_strings(
              when(pred && col(key).isNotNull, col(key).cast("string")),
              sampleN)).as(s"k$i")
          case None => max(lit("")).as(s"k$i")
        }
      }
    }
    val oneRowBase =
      if (vAggs.nonEmpty) df.agg(vAggs.head, vAggs.tail: _*)
      else df.sparkSession.range(1).toDF("_one")
    val oneRowV = distinctFrames.foldLeft(oneRowBase)(_ crossJoin _)
    val oneRow =
      if (kAggs.nonEmpty) oneRowV.crossJoin(df.agg(kAggs.head, kAggs.tail: _*))
      else oneRowV
    // unpivot the 1-row agg into the report via stack()
    val stackArgs = suite.zipWithIndex.map { case (e, i) =>
      val ks = if (sampleKey.isDefined) s", k$i" else ""
      s"'${e.name}', '${e.column}', v$i$ks"
    }.mkString(", ")
    val outCols =
      if (sampleKey.isDefined) "(expectation, column, violations, sample_keys)"
      else "(expectation, column, violations)"
    oneRow
      .select(expr(s"stack(${suite.size}, $stackArgs) AS $outCols"))
      .withColumn("passed", col("violations") === 0L)
      .orderBy("expectation", "column")
  }

  /** Fail-the-load gate: the reference DAG aborts the task when a GX
    * suite fails (de_spotify_to_bronze.py validation callback); this is
    * that control flow for a [[run]] report. The report is suite-sized
    * (one row per expectation), so the collect is O(suite). Returns the
    * report unchanged when everything passed. */
  def requireAllPassed(report: DataFrame, label: String = "dq"): DataFrame = {
    val failed = report.filter(!col("passed")).collect()
    if (failed.nonEmpty) {
      val detail = failed.map { r =>
        s"${r.getAs[String]("expectation")}(${r.getAs[String]("column")})=" +
          s"${r.getAs[Long]("violations")}"
      }.mkString(", ")
      throw new IllegalStateException(s"[$label] expectations failed: $detail")
    }
    report
  }

  /** DuckDB oracle SQL equivalent of `run` over table `table`. */
  def oracleSql(table: String, suite: Seq[Expectation],
      sampleKey: Option[String] = None, sampleN: Int = 5): String = {
    val vCols = suite.zipWithIndex
      .map { case (e, i) => s"CAST(${e.sql} AS BIGINT) AS v$i" }
    val kCols = sampleKey.toSeq.flatMap { key =>
      suite.zipWithIndex.map { case (e, i) =>
        e.rowViolatesSql match {
          case Some(pred) =>
            // list() keeps NULL elements (collect_set drops them) → the
            // FILTER also excludes NULL keys; zero violators makes the
            // aggregate NULL and DuckDB 1.0's array_to_string([]) is
            // also NULL (Spark concat_ws gives '') → outer coalesce
            s"coalesce(array_to_string(list_slice(list_sort(list(DISTINCT " +
              s"CAST($key AS VARCHAR)) FILTER (WHERE $pred AND $key IS NOT NULL)), " +
              s"1, $sampleN), ','), '') AS k$i"
          case None => s"'' AS k$i"
        }
      }
    }
    val aggCols = (vCols ++ kCols).mkString(",\n    ")
    val rows = suite.zipWithIndex.map { case (e, i) =>
      val ks = if (sampleKey.isDefined) s", k$i AS sample_keys" else ""
      s"SELECT '${e.name}' AS expectation, '${e.column}' AS \"column\", " +
        s"v$i AS violations$ks, v$i = 0 AS passed FROM agg"
    }.mkString("\n  UNION ALL ")
    s"""WITH agg AS (SELECT
    $aggCols
  FROM $table)
  $rows
  ORDER BY expectation, "column""""
  }
}
