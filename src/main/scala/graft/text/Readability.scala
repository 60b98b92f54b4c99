package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus readability profile — SURVEY.md §2.240.
  *
  * Training-data curricula and quality filters routinely bucket text
  * by reading level (easy web text vs dense technical prose); the
  * standard instrument is the Flesch reading-ease score
  * 206.835 − 1.015·(words/sentence) − 84.6·(syllables/word)
  * (Flesch 1948, same family as the Kincaid grade used by `style(1)`).
  * Syllables are approximated by vowel-group runs — the classic
  * dictionary-free heuristic; on non-Latin scripts the score is a
  * degenerate-but-deterministic constant, which is why the report is
  * per-language and the interpretation stops at Latin-script rows.
  */
object Readability {

  /** §2.240 `text_readability`: per language — document count, total
    * words/sentences/vowel-group syllables, words-per-sentence,
    * syllables-per-word, and the corpus-level Flesch reading ease
    * computed from the pooled counts (pooling before dividing keeps
    * every operand an exact integer; averaging per-doc floats would
    * be a partition-order-dependent float sum).
    *
    * Scale shape: the three counters are compiled regex counts fused
    * into the corpus scan, then ONE map-side-combined groupBy to the
    * language grain — the classic text_tokens shape (§2.30).
    *
    * Determinism: words/sentences/syllables are exact BIGINTs;
    * the three reported floats are fixed-sequence expressions of
    * identical integers, rounded once at 4 dp. */
  def textReadability(spark: SparkSession, dir: String): DataFrame = {
    val perDoc = Tables.documents(spark, dir).select(
      col("lang"),
      size(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
        .cast("long").as("w"),
      greatest(
        size(expr("regexp_extract_all(text, '[.!?]+', 0)")).cast("long"),
        lit(1L)).as("s"),
      size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
        .cast("long").as("v"))
    perDoc.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("w").as("n_words"), sum("s").as("n_sentences"),
        sum("v").as("n_syllables"))
      .filter(col("n_words") > 0)
      .select(col("lang"), col("n_docs"), col("n_words"),
        col("n_sentences"), col("n_syllables"),
        round(col("n_words").cast("double") / col("n_sentences"), 4)
          .as("words_per_sentence"),
        round(col("n_syllables").cast("double") / col("n_words"), 4)
          .as("syllables_per_word"),
        round(lit(206.835)
          - lit(1.015) * (col("n_words").cast("double") / col("n_sentences"))
          - lit(84.6) * (col("n_syllables").cast("double") / col("n_words")),
          4).as("flesch"))
      .orderBy("lang")
  }

  val textReadabilitySql: String =
    """WITH perdoc AS (SELECT lang,
      |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
      |      AS BIGINT) AS w,
      |    GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+'))
      |      AS BIGINT), 1) AS s,
      |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
      |      AS BIGINT) AS v
      |  FROM documents),
      |agg AS (SELECT lang, count(*) AS n_docs,
      |    CAST(sum(w) AS BIGINT) AS n_words,
      |    CAST(sum(s) AS BIGINT) AS n_sentences,
      |    CAST(sum(v) AS BIGINT) AS n_syllables
      |  FROM perdoc GROUP BY 1)
      |SELECT lang, n_docs, n_words, n_sentences, n_syllables,
      |  round(CAST(n_words AS DOUBLE) / n_sentences, 4)
      |    AS words_per_sentence,
      |  round(CAST(n_syllables AS DOUBLE) / n_words, 4)
      |    AS syllables_per_word,
      |  round(206.835
      |    - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
      |    - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4) AS flesch
      |FROM agg WHERE n_words > 0
      |ORDER BY lang""".stripMargin
}
