package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextFunctions._

/** §2.129 span-level duplicated-text detection — the substring
  * (k-token-gram) complement to the whole-document dedup family.
  *
  * Whole-doc dedup (exact/MinHash/SimHash) misses the dominant
  * real-corpus failure: boilerplate SPANS repeated across otherwise
  * distinct documents (headers, license blocks, templated paragraphs).
  * The published remedy (suffix-array substring dedup) keys on every
  * duplicated window; the distributed formulation here anchors on
  * k-token grams: a duplicated span of length ≥ k contains a
  * duplicated k-gram, so per-doc "fraction of gram starts whose gram
  * recurs corpus-wide" scores exactly the text a span-level dedup
  * would cut (reference test corpus: the ETL's track rows carry
  * templated artist/album text; see
  * spotify-tracks-etl-portfolio/tests/test_transform.py fixtures).
  *
  * Scale shape (the tfidf/df design, one corpus scan): the gram stream
  * collapses FIRST to per-(doc, gram) counts — map-side-combined
  * groupBy, the only corpus-sized shuffle — and corpus-wide totals
  * derive from THAT frame (vocabulary-sized, no second scan). The
  * totals join back on gram hash: hash-partitioned on the same key the
  * per-doc frame was just shuffled by, and the duplicated-grams side
  * can be semi-reduced to totals ≥ 2 before the join. Doubles appear
  * only in the final ratio — integer counts end-to-end otherwise, so
  * both engines agree bit-for-bit.
  */
object Substring {

  val GramK = 8

  /** Per-document duplicated-gram statistics: of the doc's k-token
    * gram starts, how many recur (count ≥ 2) corpus-wide — within-doc
    * repeats included, exactly like the suffix-array criterion. */
  def dedupSubstring(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val grams = docs.select(col("doc_id"),
        explode(shingles(tokens(normalize(col("text"))), GramK)).as("gram"))
      .select(col("doc_id"), hash64(col("gram")).as("h"))
    // per-(doc, gram) occurrence counts: the one corpus-sized shuffle
    val dg = grams.groupBy("doc_id", "h").agg(count(lit(1)).as("c"))
    // corpus totals from the collapsed frame; only recurring grams
    // (total ≥ 2) are needed downstream
    val dup = dg.groupBy("h").agg(sum("c").as("total"))
      .filter(col("total") >= 2)
    val perDoc = dg.join(dup, Seq("h"), "left")
      .groupBy("doc_id")
      .agg(sum("c").as("n_grams"),
        sum(when(col("total").isNotNull, col("c")).otherwise(lit(0L)))
          .as("n_dup_grams"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        coalesce(round(col("n_dup_grams").cast("double") /
          col("n_grams").cast("double"), 6), lit(0.0)).as("dup_frac"))
      .orderBy("doc_id")
  }

  val dedupSubstringSql: String = {
    val toksE = tokensSql(normalizeSql("text"))
    s"""WITH grams AS (SELECT doc_id,
       |    ${hash64Sql("gram")} AS h
       |  FROM (SELECT doc_id, unnest(${shinglesSql(toksE, GramK)}) AS gram
       |        FROM documents) t),
       |dg AS (SELECT doc_id, h, count(*) AS c FROM grams GROUP BY 1, 2),
       |dup AS (SELECT h, CAST(sum(c) AS BIGINT) AS total FROM dg
       |        GROUP BY 1 HAVING sum(c) >= 2),
       |per_doc AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
       |    CAST(sum(CASE WHEN dup.total IS NOT NULL THEN c ELSE 0 END) AS BIGINT)
       |      AS n_dup_grams
       |  FROM dg LEFT JOIN dup USING (h) GROUP BY doc_id)
       |SELECT d.doc_id,
       |  coalesce(n_grams, 0) AS n_grams,
       |  coalesce(n_dup_grams, 0) AS n_dup_grams,
       |  coalesce(round(CAST(n_dup_grams AS DOUBLE) / CAST(n_grams AS DOUBLE), 6), 0.0)
       |    AS dup_frac
       |FROM documents d LEFT JOIN per_doc USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }
}
