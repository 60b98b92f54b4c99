package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SQ8 quantization-error audit — SURVEY.md §2.245.
  *
  * The ANN ladder's compression rungs (SQ8 §2.120, PQ §2.147) trade
  * recall for memory; AnnRecallSpec measures the recall side. This is
  * the other half a 100 TB embedding store audits before committing
  * to int8: the reconstruction-error budget — how far the dequantized
  * vectors sit from the originals, and how often components saturate
  * at ±127 (the symptom of a heavy-tailed dimension that wants
  * per-dim or PQ treatment instead).
  */
object Sq8Report {

  /** §2.245 `sq8_error_report`: per embedding label — vectors,
    * components, the worst absolute reconstruction error
    * |x − q·(mx/127)| (q = the [[graft.functions.native.quantize_i8]]
    * codes, mx = the per-vector max|x|), the worst per-vector error
    * bound mx/254, and the count/share of saturated (|q| = 127)
    * components.
    *
    * Scale shape: one linear scan; the per-element error array never
    * leaves the row (array_max / filter-size collapse it in place),
    * and ONE map-side-combined groupBy lands on the label grain. max()
    * and integer sums are summation-order-immune, so there is NO
    * cross-row float ordering anywhere.
    *
    * Determinism: x is float32-exact in double, q is an exact
    * integer-valued double, and the error expression is written with
    * the identical operation order (q · (mx/127), then subtract, then
    * abs) on both engines. */
  def sq8ErrorReport(spark: SparkSession, dir: String): DataFrame = {
    // one compiled pass per vector (PlanGate r11: the previous
    // transform/zip_with/filter chain ran interpreted lambdas in the
    // embeddings corpus scan; Sq8ErrorStats is its bit-identical twin)
    val v = Tables.embeddings(spark, dir)
      .select(col("label"),
        graft.functions.native.sq8_error_stats(col("embedding")).as("st"))
      .select(col("label"), col("st.n_comp").as("n_comp"),
        col("st.max_err").as("max_err"), col("st.bound").as("bound"),
        col("st.n_sat").as("n_sat"))
    v.groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        sum("n_comp").as("n_components"),
        round(max("max_err"), 8).as("max_abs_err"),
        round(max("bound"), 8).as("max_err_bound"),
        sum("n_sat").as("sat_components"))
      .withColumn("sat_share",
        round(col("sat_components").cast("double") / col("n_components"), 6))
      .orderBy("label")
  }

  val sq8ErrorReportSql: String =
    """WITH e AS (SELECT label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
      |  FROM embeddings),
      |m AS (SELECT label, ed,
      |    list_max(list_transform(ed, x -> abs(x))) AS mx FROM e),
      |q AS (SELECT label, ed, mx, list_transform(ed,
      |    x -> round(x * (CASE WHEN mx = 0 THEN 0.0 ELSE 127.0 / mx END)))
      |    AS qv
      |  FROM m),
      |pr AS (SELECT label,
      |    CAST(len(ed) AS BIGINT) AS n_comp,
      |    list_max(list_transform(ed,
      |      x -> abs(x - round(x * (CASE WHEN mx = 0 THEN 0.0
      |        ELSE 127.0 / mx END)) * (mx / 127.0)))) AS max_err,
      |    mx / 254.0 AS bound,
      |    CAST(len(list_filter(qv, x -> abs(x) = 127.0)) AS BIGINT)
      |      AS n_sat
      |  FROM q)
      |SELECT label, count(*) AS n_vecs,
      |  CAST(sum(n_comp) AS BIGINT) AS n_components,
      |  round(max(max_err), 8) AS max_abs_err,
      |  round(max(bound), 8) AS max_err_bound,
      |  CAST(sum(n_sat) AS BIGINT) AS sat_components,
      |  round(CAST(sum(n_sat) AS DOUBLE) / sum(n_comp), 6) AS sat_share
      |FROM pr GROUP BY label
      |ORDER BY label""".stripMargin
}
