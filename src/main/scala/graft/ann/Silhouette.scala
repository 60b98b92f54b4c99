package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import Ann.dotCol
import Ann.dotSql

/** Clustering-quality measurement — SURVEY.md §2.285.
  */
object Silhouette {

  /** §2.285 `cluster_silhouette`: simplified (centroid-based)
    * silhouette per IVF cluster — for every vector, a = cosine
    * distance to its OWN centroid, b = distance to the nearest OTHER
    * centroid, s = (b−a)/max(a,b) = (cos₁−cos₂)/(1−cos₂); the
    * per-cluster mean is the standard "are these clusters real"
    * gauge for the §2.73 coarse quantizer (and the k chooser's
    * objective). Centroid-based rather than pairwise — the O(n·K)
    * formulation that scales (full silhouette is O(n²); at 100 TB
    * only the centroid form is computable, and it's the one k-means
    * actually optimizes).
    *
    * Scale shape: reuses the §2.73 deterministic Lloyd training
    * (oracle-replayed CTE-for-CTE); scoring is ONE
    * crossJoin-with-broadcast-centroids scan + a per-vector top-2
    * window (K-bounded frames per vector), collapsing to a K-row
    * report.
    *
    * Determinism: cosines are ordered-fold dots on identical doubles;
    * s is a fixed-sequence expression; each s converts to exact
    * integer MICRO-units (round(s·1e6) → BIGINT) BEFORE the
    * per-cluster sum (the cents pattern — no cross-row float sum),
    * and the mean is one final division. s ≥ 0 by construction
    * (assignment is argmax cosine, so a ≤ b always — the simplified
    * silhouette's known floor). */
  def clusterSilhouette(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val v = Ivf.vecsD(emb)
    val cent = Ivf.trainCentroids(emb)
    val w = Window.partitionBy("vec_id").orderBy(desc("cos"), asc("cid"))
    val scored = v.crossJoin(broadcast(cent))
      .withColumn("cos",
        dotCol(col("e"), col("ce")) / (col("nrm") * col("cn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
    val top2 = scored.groupBy("vec_id")
      .agg(max(when(col("rk") === 1, col("cid"))).as("cid"),
        max(when(col("rk") === 1, col("cos"))).as("cos1"),
        max(when(col("rk") === 2, col("cos"))).as("cos2"))
    val s = top2.withColumn("micro",
      expr("CAST(round((CASE WHEN cos2 < 1.0 " +
        "THEN (cos1 - cos2) / (1.0 - cos2) ELSE 0.0 END) * 1000000) " +
        "AS BIGINT)"))
    s.groupBy("cid")
      .agg(count(lit(1)).as("n_vecs"),
        round(sum("micro").cast("double") / count(lit(1)) / 1e6, 6)
          .as("mean_silhouette"))
      .orderBy("cid")
  }

  val clusterSilhouetteSql: String = {
    val (prefix, fin) = Ivf.lloydPrefixSql
    s"""WITH $prefix,
       |scored AS (SELECT vec_id, cid, cos, rk FROM (
       |  SELECT v.vec_id, c.cid,
       |    ${dotSql("v.e", "c.ce")} / (v.nrm * c.cn) AS cos,
       |    row_number() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${dotSql("v.e", "c.ce")} / (v.nrm * c.cn) DESC,
       |        c.cid) AS rk
       |  FROM v CROSS JOIN $fin c) t WHERE rk <= 2),
       |top2 AS (SELECT vec_id,
       |    max(CASE WHEN rk = 1 THEN cid END) AS cid,
       |    max(CASE WHEN rk = 1 THEN cos END) AS cos1,
       |    max(CASE WHEN rk = 2 THEN cos END) AS cos2
       |  FROM scored GROUP BY 1),
       |s AS (SELECT cid,
       |    CAST(round((CASE WHEN cos2 < 1.0
       |      THEN (cos1 - cos2) / (1.0 - cos2) ELSE 0.0 END) * 1000000)
       |      AS BIGINT) AS micro
       |  FROM top2)
       |SELECT cid, count(*) AS n_vecs,
       |  round(CAST(sum(micro) AS DOUBLE) / count(*) / 1e6, 6)
       |    AS mean_silhouette
       |FROM s GROUP BY 1 ORDER BY 1""".stripMargin
  }
}
