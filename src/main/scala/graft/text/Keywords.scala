package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.text.TextFunctions._

/** Corpus-level keyword statistics — SURVEY.md §2.140. */
object Keywords {

  /** §2.140 χ²-discriminative terms per language: for each language,
    * the top-3 tokens whose occurrence is most dependent on that
    * language under the 2×2 χ² test over the token×language
    * contingency table — the classic feature-selection / corpus-drift
    * primitive (which terms define a slice), complementing tf·idf's
    * per-DOCUMENT ranking (§2.123) with a per-SLICE one.
    *
    * χ² = N(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)) with a = count(term,
    * lang), b = term elsewhere, c = lang's other tokens, d = rest.
    * All four cells derive from ONE (lang, term) count matrix — the
    * corpus is scanned once; term totals and language totals are
    * grouped re-aggregations of that matrix (vocabulary- and
    * 5-row-sized), joined back on their keys; N is a 1-row broadcast.
    * Per-language top-3 is a window over the matrix with map-side
    * WindowGroupLimit pruning. Cells are exact BIGINTs; the χ² score
    * casts each factor to double BEFORE multiplying (identical IEEE
    * sequence in both engines — and at 100 TB cell products overflow
    * int64, so the cast is load-bearing, not cosmetic), 4 dp display
    * rounding. */
  def chi2Terms(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(spark, dir)
      .select(col("lang"), explode(tokens(lower(col("text")))).as("term"))
    val tl = words.groupBy("lang", "term").agg(count(lit(1)).as("a"))
    val termTot = tl.groupBy("term").agg(sum("a").as("term_total"))
    val langTot = tl.groupBy("lang").agg(sum("a").as("lang_total"))
    val n = tl.agg(sum("a").as("nn"))
    val d = col("nn") - col("term_total") - col("lang_total") + col("a")
    val chi2 = col("nn").cast("double") *
      (col("a").cast("double") * d.cast("double") -
        (col("term_total") - col("a")).cast("double") *
          (col("lang_total") - col("a")).cast("double")) *
      (col("a").cast("double") * d.cast("double") -
        (col("term_total") - col("a")).cast("double") *
          (col("lang_total") - col("a")).cast("double")) /
      (col("term_total").cast("double") *
        (col("nn") - col("term_total")).cast("double") *
        col("lang_total").cast("double") *
        (col("nn") - col("lang_total")).cast("double"))
    val w = Window.partitionBy("lang").orderBy(desc("chi2_raw"), col("term"))
    tl.join(broadcast(termTot), "term")
      .join(broadcast(langTot), "lang")
      .crossJoin(broadcast(n))
      // all-integer degenerate gate: a term in EVERY token or a lang
      // holding the whole corpus zeroes a margin factor — χ² is
      // undefined there; both engines emit 0.0 instead of dividing
      .withColumn("chi2_raw",
        when(col("term_total") === col("nn") ||
          col("lang_total") === col("nn"), lit(0.0)).otherwise(chi2))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("lang"), col("rk"), col("term"), col("a").as("n"),
        round(col("chi2_raw"), 4).as("chi2"))
      .orderBy("lang", "rk")
  }

  /** Minimum bigram count for a collocation candidate (PMI is
    * notoriously noisy on rare pairs — the standard count floor). */
  val CollocMinCount = 5

  /** §2.142 collocation detection via pointwise mutual information:
    * the top-20 adjacent token pairs whose co-occurrence most exceeds
    * independence, PMI = log₂(N·c(a,b) / (c(a,·)·c(·,b))) over the
    * bigram stream — the classic multiword-expression miner (Church &
    * Hanks 1990); high-PMI pairs ("hong kong") are the units a
    * tokenizer or phrase-aware dedup should treat as one symbol.
    *
    * All three count tables derive from the ONE bigram matrix the
    * corpus scan produces (left/right marginals are re-aggregations,
    * vocabulary-sized, broadcast back); N is a 1-row broadcast. PMI
    * is computed as (ln c(a,b) + ln N − ln c(a,·) − ln c(·,b))/ln 2 —
    * every log argument an exact integer, so both engines evaluate
    * the identical IEEE sequence (the §2.95 entropy convention).
    * The count floor keeps the ranked set stable and the top-20
    * window prunes map-side (WindowGroupLimit). */
  def collocations(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(tokens(lower(col("text")))))
      .toDF("doc_id", "pos", "tok")
    val bi = toks
      .withColumn("prev", lag(col("tok"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("prev").as("a"), col("tok").as("b"))
    val blm = bi.groupBy("a", "b").agg(count(lit(1)).as("cab"))
    val la = blm.groupBy("a").agg(sum("cab").as("ca"))
    val rb = blm.groupBy("b").agg(sum("cab").as("cb"))
    val n = blm.agg(sum("cab").as("nb"))
    blm.filter(col("cab") >= CollocMinCount)
      .join(broadcast(la), "a")
      .join(broadcast(rb), "b")
      .crossJoin(broadcast(n))
      .withColumn("pmi_raw",
        (log(col("cab").cast("double")) + log(col("nb").cast("double"))
          - log(col("ca").cast("double")) - log(col("cb").cast("double")))
          / log(lit(2.0)))
      // distributed top-20 (TakeOrderedAndProject), THEN rank the 20
      // survivors — no global window ever sees the candidate set
      .orderBy(desc("pmi_raw"), col("a"), col("b")).limit(20)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(desc("pmi_raw"), col("a"), col("b"))))
      .select(col("rk"), col("a"), col("b"), col("cab").as("n_pair"),
        round(col("pmi_raw"), 4).as("pmi"))
      .orderBy("rk")
  }

  val collocationsSql: String =
    s"""WITH toks AS (SELECT doc_id, pos, tok FROM (
       |    SELECT doc_id, unnest(${tokensSql("lower(text)")}) AS tok,
       |      generate_subscripts(${tokensSql("lower(text)")}, 1) AS pos
       |    FROM documents) t),
       |bi AS (SELECT lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS a,
       |    tok AS b FROM toks),
       |blm AS (SELECT a, b, count(*) AS cab FROM bi WHERE a IS NOT NULL
       |  GROUP BY 1, 2),
       |la AS (SELECT a, CAST(sum(cab) AS BIGINT) AS ca FROM blm GROUP BY 1),
       |rb AS (SELECT b, CAST(sum(cab) AS BIGINT) AS cb FROM blm GROUP BY 1),
       |n AS (SELECT CAST(sum(cab) AS BIGINT) AS nb FROM blm),
       |scored AS (SELECT a, b, cab,
       |    (ln(CAST(cab AS DOUBLE)) + ln(CAST(nb AS DOUBLE))
       |      - ln(CAST(ca AS DOUBLE)) - ln(CAST(cb AS DOUBLE))) / ln(2.0) AS pmi_raw
       |  FROM blm JOIN la USING (a) JOIN rb USING (b) CROSS JOIN n
       |  WHERE cab >= $CollocMinCount),
       |ranked AS (SELECT a, b, cab, pmi_raw,
       |    row_number() OVER (ORDER BY pmi_raw DESC, a, b) AS rk FROM scored)
       |SELECT rk, a, b, cab AS n_pair, round(pmi_raw, 4) AS pmi
       |FROM ranked WHERE rk <= 20 ORDER BY rk""".stripMargin

  val chi2TermsSql: String =
    s"""WITH words AS (SELECT lang,
       |    unnest(${tokensSql("lower(text)")}) AS term FROM documents),
       |tl AS (SELECT lang, term, count(*) AS a FROM words GROUP BY 1, 2),
       |tt AS (SELECT term, sum(a) AS term_total FROM tl GROUP BY 1),
       |lt AS (SELECT lang, sum(a) AS lang_total FROM tl GROUP BY 1),
       |n AS (SELECT sum(a) AS nn FROM tl),
       |scored AS (SELECT lang, term, a,
       |    CASE WHEN term_total = nn OR lang_total = nn THEN 0.0 ELSE
       |    CAST(nn AS DOUBLE) *
       |      (CAST(a AS DOUBLE) * CAST(nn - term_total - lang_total + a AS DOUBLE)
       |        - CAST(term_total - a AS DOUBLE) * CAST(lang_total - a AS DOUBLE)) *
       |      (CAST(a AS DOUBLE) * CAST(nn - term_total - lang_total + a AS DOUBLE)
       |        - CAST(term_total - a AS DOUBLE) * CAST(lang_total - a AS DOUBLE)) /
       |      (CAST(term_total AS DOUBLE) * CAST(nn - term_total AS DOUBLE) *
       |       CAST(lang_total AS DOUBLE) * CAST(nn - lang_total AS DOUBLE))
       |    END AS chi2_raw
       |  FROM tl JOIN tt USING (term) JOIN lt USING (lang) CROSS JOIN n),
       |ranked AS (SELECT lang, term, a, chi2_raw,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY chi2_raw DESC, term) AS rk FROM scored)
       |SELECT lang, rk, term, a AS n, round(chi2_raw, 4) AS chi2
       |FROM ranked WHERE rk <= 3 ORDER BY lang, rk""".stripMargin
}
