package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Reciprocal-rank fusion of retrieval rankings — SURVEY.md §2.283.
  */
object Fusion {

  /** RRF smoothing constant (Cormack, Clarke & Buettcher SIGIR'09 —
    * k=60, the published default). */
  val RrfK = 60

  /** Candidate depth taken from each input ranking. */
  val FuseDepth = 30

  /** Fused results reported per query. */
  val FuseTopK = 10

  /** §2.283 `rank_fusion`: reciprocal-rank fusion of the exact-cosine
    * ranking (§2.26) and the SQ8 quantized ranking (§2.120) —
    * score(d) = Σ_r 1/([[RrfK]] + rank_r(d)) over the rankings that
    * retrieved d in their top [[FuseDepth]]. THE standard way to
    * combine retrieval channels without score calibration (ranks,
    * not scores, so a quantized channel and an exact channel fuse
    * cleanly) — at 100 TB this is how a cheap-but-coarse index and an
    * expensive-but-exact re-scorer vote on the final candidate set.
    *
    * Scale shape: both input rankings are already per-query
    * top-[[FuseDepth]] frames (nq·depth rows — query-bounded, never
    * corpus-sized); the fusion is a full outer join + window over
    * that bounded frame.
    *
    * Determinism: ranks are exact integers off 6 dp-rounded cosines
    * with vec_id tie-breaks (the §2.26/120 contracts); the RRF score
    * is ONE fixed-sequence two-term float expression per row, rounded
    * 6 dp, ties broken by vec_id. */
  def rankFusion(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val exact = Ann.bruteForceTopK(emb, k = FuseDepth)
      .select(col("q_id"), col("vec_id"), col("rk").as("rk_exact"))
    val sq8 = Ann.sq8TopK(emb, k = FuseDepth)
      .select(col("q_id"), col("vec_id"), col("rk").as("rk_sq8"))
    val fused = exact.join(sq8, Seq("q_id", "vec_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(RrfK) + col("rk_exact")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(RrfK) + col("rk_sq8")), lit(0.0)), 6))
    val w = Window.partitionBy("q_id").orderBy(desc("rrf"), col("vec_id"))
    fused.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= FuseTopK)
      .select("q_id", "rk", "vec_id", "rrf", "rk_exact", "rk_sq8")
      .orderBy("q_id", "rk")
  }

  val rankFusionSql: String =
    s"""WITH exact AS (
       |  SELECT q_id, vec_id, rk AS rk_exact
       |  FROM (${Ann.bruteForceTopKSql(k = FuseDepth)
                  .replaceAll("(?s)ORDER BY q_id, rk$", "")}) x),
       |sq8 AS (
       |  SELECT q_id, vec_id, rk AS rk_sq8
       |  FROM (${Ann.sq8TopKSql(k = FuseDepth)
                  .replaceAll("(?s)ORDER BY q_id, rk$", "")}) y),
       |fused AS (
       |  SELECT coalesce(exact.q_id, sq8.q_id) AS q_id,
       |    coalesce(exact.vec_id, sq8.vec_id) AS vec_id,
       |    rk_exact, rk_sq8,
       |    round(coalesce(1.0 / ($RrfK + rk_exact), 0.0)
       |        + coalesce(1.0 / ($RrfK + rk_sq8), 0.0), 6) AS rrf
       |  FROM exact FULL OUTER JOIN sq8
       |    ON exact.q_id = sq8.q_id AND exact.vec_id = sq8.vec_id)
       |SELECT q_id, rk, vec_id, rrf, rk_exact, rk_sq8 FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |      ORDER BY rrf DESC, vec_id) AS rk
       |  FROM fused) t
       |WHERE rk <= $FuseTopK ORDER BY q_id, rk""".stripMargin
}
