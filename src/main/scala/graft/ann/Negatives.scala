package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Hard-negative mining for contrastive training — SURVEY.md §2.265.
  *
  * Contrastive objectives (SimCLR/DPR/sentence encoders) learn little
  * from random negatives; the gradient signal lives in HARD negatives
  * — examples the current embedding thinks are similar but aren't
  * (different label), excluding near-duplicates (cos ≥ 0.95), which
  * are more likely unlabeled positives than informative negatives
  * (the standard false-negative guard in dense-retrieval mining).
  */
object Negatives {

  /** Near-duplicate ceiling: candidates at or above this cosine are
    * excluded as probable unlabeled positives. */
  val DupCeiling = 0.95

  /** §2.265 `hard_negatives`: for each query vector (vec_id < nq),
    * the top-k highest-cosine DIFFERENT-label vectors below
    * [[DupCeiling]] — the per-anchor hard-negative set a contrastive
    * training job exports.
    *
    * Scale shape: the §2.26 baseline — nq query rows broadcast
    * against ONE linear scan, per-query top-k window (ties broken by
    * vec_id). At corpus scale the same band-and-rank runs inside the
    * §2.73 IVF blocking (probe cells, then rank) — the brute form IS
    * the oracle for that path, the same relationship as
    * ann_topk/ann_ivf.
    *
    * Determinism: cosines are fixed-sequence floats of float32-exact
    * doubles (the DotProductFold kernel ≡ DuckDB's ordered
    * list_reduce), rounded at 6 dp BEFORE ranking so both engines
    * rank the identical grid. */
  def hardNegatives(spark: SparkSession, dir: String,
      nq: Int = 5, k: Int = 10): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val v = emb.select(col("vec_id"), col("label"), col("embedding"),
      Ann.normCol(col("embedding")).as("nrm"))
    val q = v.filter(col("vec_id") < nq).limit(nq) // structural bound mark
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("embedding").as("qe"), col("nrm").as("qn"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(desc("cosine"), asc("vec_id"))
    v.join(broadcast(q), col("vec_id") =!= col("q_id") &&
        col("label") =!= col("q_label"))
      .withColumn("cosine",
        round(Ann.dotCol(col("qe"), col("embedding")) /
          (col("qn") * col("nrm")), 6))
      .filter(col("cosine") < DupCeiling)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("vec_id"),
        col("label").as("neg_label"), col("cosine"))
      .orderBy("q_id", "rk")
  }

  def hardNegativesSql(nq: Int = 5, k: Int = 10): String =
    s"""WITH v AS (SELECT vec_id, label, embedding,
       |    ${Ann.normSql("embedding")} AS nrm FROM embeddings),
       |q AS (SELECT vec_id AS q_id, label AS q_label, embedding AS qe,
       |    nrm AS qn FROM v WHERE vec_id < $nq),
       |scored AS (SELECT q.q_id, v.vec_id, v.label AS neg_label,
       |    round(${Ann.dotSql("q.qe", "v.embedding")} / (q.qn * v.nrm), 6)
       |      AS cosine
       |  FROM v JOIN q ON v.vec_id != q.q_id AND v.label != q.q_label)
       |SELECT q_id, rk, vec_id, neg_label, cosine FROM (
       |  SELECT q_id, vec_id, neg_label, cosine,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY cosine DESC, vec_id) AS rk
       |  FROM scored WHERE cosine < ${DupCeiling}) t
       |WHERE rk <= $k ORDER BY q_id, rk""".stripMargin
}
