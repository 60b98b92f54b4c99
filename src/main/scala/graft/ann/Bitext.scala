package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import Ann.{dotCol, dotSql, normCol, normSql}

/** §2.130 margin-based bitext mining — the cross-lingual
  * parallel-corpus construction op (the CCMatrix/LASER recipe): for
  * every source-language document, find the target-language document
  * whose embedding is closest not in ABSOLUTE cosine but in cosine
  * relative to each side's nearest-neighbor density
  * (Artetxe & Schwenk's ratio margin). Absolute-threshold mining fails
  * because hubness makes some vectors near everything; dividing by the
  * mean of each side's top-k cosines cancels the hub term, and a pair
  * is kept only when it stands OUT of both neighborhoods
  * (margin ≥ θ > 1).
  *
  *   margin(x, y) = cos(x, y) / ((knnAvg(x) + knnAvg(y)) / 2)
  *
  * Shape: language tags live on `documents`, vectors on `embeddings`
  * (vec_id = doc_id) — one equi-join each side. The src×tgt score
  * matrix is computed ONCE and feeds all three consumers (x-side kNN
  * average, y-side kNN average, the pair ranking) — no second scoring
  * pass. Both kNN averages reduce via rank-then-aggregate on ROUNDED
  * cosines (integer-free doubles with 4 summands: both engines agree
  * to well under the 6 dp output rounding). At 100 TB the dense
  * src×tgt product is the one non-linear stage; it blocks with the IVF
  * coarse quantizer exactly like [[Ann.ivfTopK]] (score only same-cell
  * pairs, nprobe cells per query) — the margin arithmetic downstream
  * of the score table is unchanged, which is why the brute-force
  * formulation here IS the oracle-checkable contract.
  */
object Bitext {

  val SrcLang = "en"
  val TgtLang = "de"
  val KnnK = 4
  val MarginMin = 1.02

  private def side(spark: SparkSession, dir: String, lang: String,
      id: String, e: String, n: String): DataFrame =
    Tables.documents(spark, dir).filter(col("lang") === lang)
      .select(col("doc_id").as(id))
      .join(Tables.embeddings(spark, dir)
          .withColumnRenamed("vec_id", id),
        Seq(id))
      .select(col(id), col("embedding").as(e),
        normCol(col("embedding")).as(n))

  /** Best target per source doc by ratio margin, margin ≥ θ. */
  def bitextMine(spark: SparkSession, dir: String): DataFrame = {
    val src = side(spark, dir, SrcLang, "src_id", "se", "sn")
    val tgt = side(spark, dir, TgtLang, "tgt_id", "te", "tn")
    val scored = src.crossJoin(broadcast(tgt))
      .select(col("src_id"), col("tgt_id"),
        round(dotCol(col("se"), col("te")) / (col("sn") * col("tn")), 6)
          .as("cos"))
    val wx = Window.partitionBy("src_id").orderBy(desc("cos"), asc("tgt_id"))
    val wy = Window.partitionBy("tgt_id").orderBy(desc("cos"), asc("src_id"))
    val knnX = scored.withColumn("rk", row_number().over(wx))
      .filter(col("rk") <= KnnK)
      .groupBy("src_id").agg(avg("cos").as("kx"))
    val knnY = scored.withColumn("rk", row_number().over(wy))
      .filter(col("rk") <= KnnK)
      .groupBy("tgt_id").agg(avg("cos").as("ky"))
    val margins = scored
      .join(knnX, Seq("src_id")).join(knnY, Seq("tgt_id"))
      .withColumn("margin",
        round(col("cos") / ((col("kx") + col("ky")) / 2.0), 6))
    val wbest = Window.partitionBy("src_id")
      .orderBy(desc("margin"), asc("tgt_id"))
    margins.withColumn("rk", row_number().over(wbest))
      .filter(col("rk") === 1 && col("margin") >= MarginMin)
      .select(col("src_id"), col("tgt_id"), col("cos").as("cosine"),
        col("margin"))
      .orderBy("src_id")
  }

  val bitextMineSql: String =
    s"""WITH src AS (SELECT d.doc_id AS src_id, e.embedding AS se,
       |    ${normSql("e.embedding")} AS sn
       |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
       |  WHERE d.lang = '$SrcLang'),
       |tgt AS (SELECT d.doc_id AS tgt_id, e.embedding AS te,
       |    ${normSql("e.embedding")} AS tn
       |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
       |  WHERE d.lang = '$TgtLang'),
       |scored AS (SELECT src_id, tgt_id,
       |    round(${dotSql("se", "te")} / (sn * tn), 6) AS cos
       |  FROM src CROSS JOIN tgt),
       |knnx AS (SELECT src_id, avg(cos) AS kx FROM (
       |    SELECT src_id, cos, row_number() OVER (PARTITION BY src_id
       |      ORDER BY cos DESC, tgt_id) AS rk FROM scored) t
       |  WHERE rk <= $KnnK GROUP BY src_id),
       |knny AS (SELECT tgt_id, avg(cos) AS ky FROM (
       |    SELECT tgt_id, cos, row_number() OVER (PARTITION BY tgt_id
       |      ORDER BY cos DESC, src_id) AS rk FROM scored) t
       |  WHERE rk <= $KnnK GROUP BY tgt_id),
       |margins AS (SELECT src_id, tgt_id, cos,
       |    round(cos / ((kx + ky) / 2.0), 6) AS margin
       |  FROM scored JOIN knnx USING (src_id) JOIN knny USING (tgt_id))
       |SELECT src_id, tgt_id, cos AS cosine, margin FROM (
       |  SELECT src_id, tgt_id, cos, margin,
       |    row_number() OVER (PARTITION BY src_id
       |      ORDER BY margin DESC, tgt_id) AS rk
       |  FROM margins) t
       |WHERE rk = 1 AND margin >= $MarginMin
       |ORDER BY src_id""".stripMargin
}
