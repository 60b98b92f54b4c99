package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.native

/** Johnson–Lindenstrauss random projection — SURVEY.md §2.338.
  *
  * §2.230's PCA needs a covariance pass + eigensolve; the JL lemma
  * says a DATA-OBLIVIOUS ±1 projection already preserves pairwise
  * distances to 1±ε at d' = O(log n / ε²) — no training pass, no
  * model to ship, embarrassingly parallel, which is why sketch-first
  * pipelines (dedup pre-filters, coarse ANN, streaming) reach for it
  * at 100 TB before anything learned. Achlioptas (2003) sharpens it:
  * entries from {+1, −1, 0} w.p. {1/6, 1/6, 2/3} — two-thirds of the
  * multiplies vanish. This op projects 64-d embeddings to 16-d and
  * AUDITS the lemma on the corpus: per adjacent vector pair, original
  * vs projected squared distance and the unbiased distortion ratio
  * (3/16 · d²_proj / d²_orig, expected ≈ 1).
  */
object Jl {

  /** Projected dimensionality. */
  val DOut = 16

  /** §2.338 `jl_projection`: per adjacent pair (vec_id, vec_id+1):
    * original squared L2 distance, projected squared distance, and
    * the scale-corrected distortion ratio.
    *
    * Scale shape: projection is a per-row compiled kernel
    * ([[graft.functions.JlProject]] — no interpreted lambdas in the
    * corpus scan, the §2.334 gate rule); the pair frame is ONE
    * equi-join on vec_id+1 (linear, hash-partitioned); distances are
    * the polarization identity over three [[graft.functions
    * .DotProductFold]] kernels so no subtraction array materializes.
    *
    * Determinism: the projection matrix is LCG-derived (identical
    * cross-engine, see the kernel doc); every dot is the
    * bit-identical sequential fold; d² = (d_aa + d_bb) − 2·d_ab and
    * the ratio (d²_p · 3 / 16) / d²_o are single fixed-sequence
    * expressions rounded at 6 dp; identical adjacent vectors
    * INTEGER-gate the ratio to NULL (d²_o is exactly 0.0 only when
    * the folds are bitwise equal — same test both engines). */
  def jlProjection(spark: SparkSession, dir: String): DataFrame = {
    def dot(a: Column, b: Column): Column = native.dot_product_fold(a, b)
    val proj = Tables.embeddings(spark, dir).select(
      col("vec_id"), col("embedding"),
      native.jl_project(col("embedding"), DOut).as("p"))
    def d2(a: Column, b: Column): Column =
      dot(a, a) + dot(b, b) - lit(2.0) * dot(a, b)
    proj.alias("a")
      .join(proj.alias("b"), col("b.vec_id") === col("a.vec_id") + 1)
      .select(
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        d2(col("a.embedding"), col("b.embedding")).as("d2o"),
        d2(col("a.p"), col("b.p")).as("d2p"))
      .select(col("vec_a"), col("vec_b"),
        round(col("d2o"), 6).as("d2_orig"),
        round(col("d2p"), 6).as("d2_proj"),
        when(col("d2o") > 0.0,
          round(col("d2p") * 3.0 / 16.0 / col("d2o"), 6)).as("distortion"))
      .orderBy("vec_a")
  }

  /** The projection in DuckDB: same LCG, same j-ordered fold. SQL
    * list indexing is 1-based so the flat index is k·n + (j−1). */
  private def projSql(v: String): String =
    s"""list_transform(generate_series(0, ${DOut - 1}), k ->
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(generate_series(1, len($v)), j ->
       |        CAST($v[j] AS DOUBLE) * CAST(
       |          CASE ((1103515245 * (k * len($v) + j - 1) + 12345)
       |              % 2147483648) % 6
       |            WHEN 0 THEN 1.0 WHEN 1 THEN -1.0 ELSE 0.0 END
       |          AS DOUBLE))),
       |      (x, y) -> x + y))""".stripMargin

  val jlProjectionSql: String = {
    def d2(a: String, b: String): String =
      s"(${Ann.dotSql(a, a)} + ${Ann.dotSql(b, b)})" +
        s" - 2.0 * ${Ann.dotSql(a, b)}"
    s"""WITH proj AS (SELECT vec_id, embedding,
       |    ${projSql("embedding")} AS p
       |  FROM embeddings),
       |pairs AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    ${d2("a.embedding", "b.embedding")} AS d2o,
       |    ${d2("a.p", "b.p")} AS d2p
       |  FROM proj a JOIN proj b ON b.vec_id = a.vec_id + 1)
       |SELECT vec_a, vec_b, round(d2o, 6) AS d2_orig,
       |  round(d2p, 6) AS d2_proj,
       |  CASE WHEN d2o > 0.0 THEN round(d2p * 3.0 / 16.0 / d2o, 6) END
       |    AS distortion
       |FROM pairs ORDER BY vec_a""".stripMargin
  }
}
