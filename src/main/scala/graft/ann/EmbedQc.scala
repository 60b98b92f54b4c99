package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Embedding-space quality control — SURVEY.md §2 item 197.
  *
  * Distance-to-centroid outlier mining: the vectors farthest from
  * their own label's centroid are the mislabeled/garbage candidates a
  * curation pass reviews first (the SemDeDup/CCNet-style "prune the
  * cluster fringe" heuristic, §2.119's blocking reused as QC).
  */
object EmbedQc {

  /** Outliers reported per label. */
  val TopK = 3

  /** §2.197 per-label centroid distance outliers: each label's
    * [[TopK]] farthest members by L2 distance to the label centroid.
    *
    * Determinism: centroid dims are per-dim means ROUNDED 6 dp (the
    * §2.73 Lloyd recipe — engine sum-order noise ~1e-15 sits far
    * under the grid); distances expand to |x|² − 2⟨x,c⟩ + |c|², each
    * term the SAME index-ordered fold on both engines
    * ([[Ann.dotCol]] / [[Ann.dotSql]]), so the doubles are
    * bit-identical before their 6 dp display rounding.
    *
    * Scale shape: ONE posexplode scan → (label, dim)-grain map-side-
    * combined means (|labels|·dim rows — constant), centroid arrays
    * reassembled via array_sort (executor-order-free) and BROADCAST
    * back onto the corpus scan; per-row distance is codegen'd; the
    * top-k window partitions by label with the WindowGroupLimit
    * per-partition prune, never a global sort. */
  def embedOutliers(spark: SparkSession, dir: String): DataFrame = {
    val vecs = Tables.embeddings(spark, dir)
    val centroids = vecs
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "xf")))
      .groupBy("label", "dim")
      .agg(round(avg(col("xf").cast("double")), 6).as("c"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
        s => s.getField("c")).as("centroid"))
    val w = Window.partitionBy("label")
      .orderBy(desc("dist"), asc("vec_id"))
    vecs.join(broadcast(centroids), "label")
      .withColumn("dist", round(sqrt(greatest(lit(0.0),
        Ann.dotCol(col("embedding"), col("embedding")) -
          lit(2.0) * Ann.dotCol(col("embedding"), col("centroid")) +
          Ann.dotCol(col("centroid"), col("centroid")))), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .select(col("label"), col("rk"), col("vec_id"), col("dist"))
      .orderBy("label", "rk")
  }

  val embedOutliersSql: String = {
    import Ann.dotSql
    val d2 = s"${dotSql("embedding", "embedding")} - " +
      s"2.0 * ${dotSql("embedding", "centroid")} + " +
      s"${dotSql("centroid", "centroid")}"
    s"""WITH dims AS (SELECT label, u.dim AS dim, u.x AS x
       |  FROM (SELECT label,
       |      unnest(list_transform(generate_series(1, len(embedding)),
       |        i -> {'dim': i - 1, 'x': CAST(embedding[i] AS DOUBLE)})) AS u
       |    FROM embeddings) t),
       |cen AS (SELECT label, list(round(c, 6) ORDER BY dim) AS centroid
       |  FROM (SELECT label, dim, avg(x) AS c FROM dims GROUP BY 1, 2) m
       |  GROUP BY label),
       |scored AS (SELECT e.label AS label, e.vec_id AS vec_id,
       |    round(sqrt(greatest(0.0, $d2)), 6) AS dist
       |  FROM embeddings e JOIN cen USING (label)),
       |rk AS (SELECT label, vec_id, dist,
       |    row_number() OVER (PARTITION BY label
       |      ORDER BY dist DESC, vec_id) AS rk
       |  FROM scored)
       |SELECT label, rk, vec_id, dist FROM rk
       |WHERE rk <= ${TopK} ORDER BY label, rk""".stripMargin
  }
}
