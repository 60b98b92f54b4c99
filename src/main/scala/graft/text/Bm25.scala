package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import TextFunctions._

/** BM25 ranked retrieval — SURVEY.md §2 item 178.
  *
  * The retrieval-grade upgrade of §2.123's tf-idf: Okapi BM25 with
  * per-document length normalization — the scoring half of the
  * "search your own training corpus" loop (quality mining, targeted
  * decontamination, near-dup triage all start from a ranked query).
  *
  *   score(d) = Σ_t idf(t) · tf·(k₁+1) / (tf + k₁·(1−b+b·|d|/avgdl)),
  *   idf(t)   = ln(1 + (N−df+0.5)/(df+0.5))
  *
  * Scale shape: the term filter lands BEFORE the tf groupBy, so only
  * postings of the |Q|=3 query terms shuffle (the inverted-index
  * access pattern, not a corpus scan per query); doc lengths are one
  * map-side-combined groupBy reused from the same exploded frame; df
  * and N are |Q|-row / 1-row broadcasts. Top-k is orderBy+limit —
  * TakeOrdered per partition, no global sort — with rank assigned on
  * the ≤k-row result. */
object Bm25 {

  val QueryTerms: Seq[String] = Seq("spark", "shuffle", "join")
  val K1 = 1.2
  val B = 0.75
  val TopK = 10

  def bm25Topk(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(lower(col("text")))).as("term"))
    val dl = words.groupBy("doc_id").agg(count(lit(1)).as("dlen"))
    val avgdl = dl.agg(avg(col("dlen").cast("double")).as("avgdl"))
    val n = Tables.documents(spark, dir).agg(count(lit(1)).as("n"))
    val tf = words.filter(col("term").isin(QueryTerms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(avgdl))
      .crossJoin(broadcast(n))
      .withColumn("idf", log(lit(1.0) +
        (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("contrib",
        col("idf") * col("tf") * (lit(K1) + 1.0) /
          (col("tf") + lit(K1) *
            (lit(1.0 - B) + lit(B) * col("dlen") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(round(sum("contrib"), 6).as("score"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(TopK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("score"), asc("doc_id"))
    scored.withColumn("rk", row_number().over(w))
      .select("rk", "doc_id", "score", "n_terms_hit")
      .orderBy("rk")
  }

  val bm25TopkSql: String = {
    val terms = QueryTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH words AS (SELECT doc_id,
       |    unnest(${tokensSql("lower(text)")}) AS term FROM documents),
       |dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dlen
       |  FROM words GROUP BY 1),
       |ad AS (SELECT avg(dlen) AS avgdl FROM dl),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM words
       |  WHERE term IN ($terms) GROUP BY 1, 2),
       |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
       |scored AS (SELECT doc_id,
       |    round(sum(ln(1.0 + (n - df + 0.5) / (df + 0.5)) * tf * ${K1 + 1.0} /
       |      (tf + $K1 * (${1.0 - B} + $B * dlen / avgdl))), 6) AS score,
       |    count(*) AS n_terms_hit
       |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), ad, nn
       |  GROUP BY doc_id)
       |SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS rk,
       |  doc_id, score, n_terms_hit
       |FROM scored ORDER BY score DESC, doc_id LIMIT $TopK""".stripMargin
  }
}
