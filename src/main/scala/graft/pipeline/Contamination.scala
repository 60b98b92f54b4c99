package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextFunctions._

/** Benchmark decontamination — SURVEY.md §2 item 72.
  *
  * A training pipeline must drop (or flag) training documents that
  * overlap an evaluation set, or benchmark scores are fiction. The
  * standard recipe is k-token n-gram overlap: a train doc is
  * contaminated in proportion to how many of its distinct n-grams
  * appear anywhere in the eval split.
  *
  * Scale design: the eval set is always tiny relative to the corpus
  * (benchmarks are MBs, corpora are TBs), so its distinct-gram set is
  * collected into a broadcast and the check is a broadcast LEFT SEMI
  * join against the exploded train grams — one linear scan over the
  * corpus, no shuffle of the big side, no pairwise comparisons. Gram
  * hashing reuses the compiled shingle kernels
  * ([[graft.functions.TokenPolyHashes]]/ShinglePolyHashes).
  */
object Contamination {

  /** Eval split stand-in: two of the corpus's twenty sources. */
  val TestSources: Seq[String] = Seq("src0", "src1")
  val K = 5
  val FlagThreshold = 0.1

  /** Per-train-doc n-gram overlap with the eval split: distinct-gram
    * count, hit count, contamination fraction, flag. */
  def decontaminate(docs: DataFrame): DataFrame = {
    val g = docs.select(col("doc_id"), col("source"),
        array_distinct(graft.functions.native.shingle_hashes(
          graft.functions.native.token_poly_hashes(col("text")), K)).as("sh"))
      .filter(size(col("sh")) > 0)
    val isTest = col("source").isin(TestSources: _*)
    val testGrams = g.filter(isTest).select(explode(col("sh")).as("h")).distinct()
    val train = g.filter(!isTest)
    val hits = train.select(col("doc_id"), explode(col("sh")).as("h"))
      .join(broadcast(testGrams), Seq("h"), "leftsemi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    train.select(col("doc_id"), size(col("sh")).cast("long").as("n_grams"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("contamination",
        round(col("n_hit").cast("double") / col("n_grams"), 6))
      .withColumn("flagged", col("contamination") >= FlagThreshold)
      .select("doc_id", "n_grams", "n_hit", "contamination", "flagged")
      .orderBy("doc_id")
  }

  val decontaminateSql: String = {
    val srcList = TestSources.map(s => s"'$s'").mkString(", ")
    s"""WITH g AS (SELECT doc_id, source, sh FROM (
       |    SELECT doc_id, source,
       |      list_distinct(${shingleHashCombineSql("th", K)}) AS sh
       |    FROM (SELECT doc_id, source, ${tokenHashesSql("text")} AS th
       |          FROM documents) t0) t1
       |  WHERE len(sh) > 0),
       |test AS (SELECT DISTINCT unnest(sh) AS h FROM g
       |  WHERE source IN ($srcList)),
       |tr AS (SELECT doc_id, sh FROM g WHERE source NOT IN ($srcList)),
       |ex AS (SELECT doc_id, unnest(sh) AS h FROM tr),
       |hits AS (SELECT doc_id, count(*) AS n_hit FROM ex
       |  WHERE h IN (SELECT h FROM test) GROUP BY doc_id)
       |SELECT tr.doc_id, CAST(len(tr.sh) AS BIGINT) AS n_grams,
       |  CAST(coalesce(hits.n_hit, 0) AS BIGINT) AS n_hit,
       |  round(coalesce(hits.n_hit, 0) / CAST(len(tr.sh) AS DOUBLE), 6) AS contamination,
       |  round(coalesce(hits.n_hit, 0) / CAST(len(tr.sh) AS DOUBLE), 6) >= $FlagThreshold AS flagged
       |FROM tr LEFT JOIN hits ON tr.doc_id = hits.doc_id
       |ORDER BY tr.doc_id""".stripMargin
  }
}
