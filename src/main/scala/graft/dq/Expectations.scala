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
}

final case class NotNull(column: String) extends Expectation {
  val name = "not_null"
  def violations: Column = count(lit(1)) - count(col(column))
  def sql = s"count(*) - count($column)"
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
}

final case class InSet(column: String, values: Seq[String]) extends Expectation {
  val name = "in_set"
  def violations: Column =
    sum(when(!col(column).isin(values: _*), 1L).otherwise(0L))
  def sql = {
    val vs = values.map(v => s"'$v'").mkString(", ")
    s"coalesce(sum(CASE WHEN $column NOT IN ($vs) THEN 1 ELSE 0 END), 0)"
  }
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
}

object Expectations {

  /** Evaluate a suite in one aggregation pass; returns the DQ report
    * DataFrame (expectation, column, violations, passed). */
  def run(df: DataFrame, suite: Seq[Expectation]): DataFrame = {
    val aggs = suite.zipWithIndex.map { case (e, i) =>
      e.violationsFor(df).cast("long").as(s"v$i")
    }
    val oneRow = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the 1-row agg into the report via stack()
    val stackArgs = suite.zipWithIndex.map { case (e, i) =>
      s"'${e.name}', '${e.column}', v$i"
    }.mkString(", ")
    oneRow
      .select(expr(s"stack(${suite.size}, $stackArgs) AS (expectation, column, violations)"))
      .withColumn("passed", col("violations") === 0L)
      .orderBy("expectation", "column")
  }

  /** DuckDB oracle SQL equivalent of `run` over table `table`. */
  def oracleSql(table: String, suite: Seq[Expectation]): String = {
    val aggCols = suite.zipWithIndex
      .map { case (e, i) => s"CAST(${e.sql} AS BIGINT) AS v$i" }.mkString(",\n    ")
    val rows = suite.zipWithIndex.map { case (e, i) =>
      s"SELECT '${e.name}' AS expectation, '${e.column}' AS \"column\", v$i AS violations, v$i = 0 AS passed FROM agg"
    }.mkString("\n  UNION ALL ")
    s"""WITH agg AS (SELECT
    $aggCols
  FROM $table)
  $rows
  ORDER BY expectation, "column""""
  }
}
