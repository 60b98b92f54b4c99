package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import TextFunctions._

/** Corpus-construction analysis ops — SURVEY.md §2 items 194–196.
  *
  * Three pretraining-pipeline reports over `documents`: per-document
  * n-gram novelty (is a new crawl increment adding anything?),
  * boilerplate n-gram detection (the C4-style template remover's
  * find phase), and the per-slice corpus data card (the composition
  * table every dataset release ships).
  */
object CorpusOps {

  /** Shingle width shared by novelty and boilerplate. */
  val NGram = 3

  /** §2.194 per-document n-gram novelty: the share of a doc's DISTINCT
    * 3-gram shingles whose FIRST corpus occurrence (min doc_id) is this
    * doc — the increment-value score: re-crawled/boilerplate content
    * scores near 0, genuinely new text near 1 (doc_id is ingest order,
    * so "first" is well-defined and incremental: yesterday's min-doc
    * table is a mergeable state, new days only LOWER nothing).
    *
    * Scale shape: ONE compiled-kernel scan (graft ShingleStrings —
    * the HOF formulation pays the round-1 interpreted-lambda tax per
    * gram) → ONE gram-key exchange where a min window marks each
    * instance against its gram's first doc (no second scan, no
    * join-back — the gram stream is touched once) → a doc-grain
    * aggregate. Gram keys are 60-bit hashes (8 bytes), not strings,
    * on the shuffle wire; nothing is ever all-pairs. */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.functions.native.shingle_strings(col("text"), NGram))
          .as("gram"))
      .select(col("doc_id"), hash64(col("gram")).as("g"))
    val wFirst = org.apache.spark.sql.expressions.Window.partitionBy("g")
    grams
      .withColumn("first_doc", min("doc_id").over(wFirst))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty_pct",
        round(col("n_novel") * 100.0 / col("n_grams"), 4))
      .orderBy("doc_id")
  }

  val ngramNoveltySql: String =
    s"""WITH g AS (
       |  SELECT doc_id, ${hash64Sql("gram.g")} AS g
       |  FROM (SELECT doc_id,
       |      unnest(list_distinct(${shinglesSql(tokensSql("lower(text)"), NGram)}))
       |        AS g
       |    FROM documents) gram(doc_id, g)),
       |fw AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY g) AS first_doc
       |  FROM g)
       |SELECT doc_id, count(*) AS n_grams,
       |  CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_novel,
       |  round(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
       |    * 100.0 / count(*), 4) AS novelty_pct
       |FROM fw GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** boilerplate_ngrams doc-frequency floor. */
  val MinDf = 5

  /** §2.195 boilerplate n-gram detection: the top-20 3-gram shingles by
    * DOCUMENT frequency (distinct docs containing them, floor
    * [[MinDf]]) with their corpus share — the find phase of C4-style
    * template/boilerplate removal (nav bars, cookie banners, license
    * headers recur verbatim across unrelated pages; the removal phase
    * is a broadcast filter of these grams, the §2.72 decontaminate
    * machinery pointed at the corpus's own templates).
    *
    * Scale shape: per-doc DISTINCT before the count, so a doc
    * repeating its own template doesn't inflate df; ONE gram-grain
    * map-side-combined groupBy; the total-docs count is a 1-row
    * broadcast; top-20 via TakeOrderedAndProject (no global sort).
    * The df floor bounds nothing upstream — it's output selection —
    * but the OUTPUT is ≤20 rows whatever the corpus. */
  def boilerplateNgrams(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    docs.select(col("doc_id"),
        explode(graft.functions.native.shingle_strings(col("text"), NGram))
          .as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") >= MinDf)
      .crossJoin(broadcast(nDocs))
      .select(col("gram"), col("df"),
        round(col("df") * 100.0 / col("n_docs"), 4).as("doc_pct"))
      .orderBy(desc("df"), asc("gram"))
      .limit(20)
  }

  val boilerplateNgramsSql: String =
    s"""WITH g AS (
       |  SELECT doc_id,
       |    unnest(list_distinct(${shinglesSql(tokensSql("lower(text)"), NGram)}))
       |      AS gram
       |  FROM documents),
       |df AS (SELECT gram, count(*) AS df FROM g GROUP BY gram
       |  HAVING count(*) >= $MinDf)
       |SELECT gram, df,
       |  round(df * 100.0 / (SELECT count(*) FROM documents), 4) AS doc_pct
       |FROM df
       |ORDER BY df DESC, gram LIMIT 20""".stripMargin

  /** §2.196 corpus data card: the per-(source, lang) composition table
    * a dataset release ships — doc counts, token totals, token share
    * of the whole corpus, mean document length. ONE map-side-combined
    * scan to |sources|×|langs| cells; the corpus total re-aggregates
    * the cells (never a second scan) and broadcasts back. Token counts
    * reuse the §2.30 whitespace convention. */
  def corpusDatacard(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.documents(spark, dir)
      .select(col("source"), col("lang"),
        size(tokens(col("text"))).cast("long").as("n_toks"),
        col("n_chars"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_toks").as("n_tokens"),
        round(avg("n_chars"), 2).as("avg_chars"))
    val total = cells.agg(sum("n_tokens").as("tot_tokens"))
    cells.crossJoin(broadcast(total))
      .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens") * 100.0 / col("tot_tokens"), 4).as("token_pct"),
        col("avg_chars"))
      .orderBy("source", "lang")
  }

  val corpusDatacardSql: String =
    s"""WITH cells AS (
       |  SELECT source, lang, count(*) AS n_docs,
       |    CAST(sum(len(${tokensSql("text")})) AS BIGINT) AS n_tokens,
       |    round(avg(n_chars), 2) AS avg_chars
       |  FROM documents GROUP BY source, lang)
       |SELECT source, lang, n_docs, n_tokens,
       |  round(n_tokens * 100.0 / (SELECT sum(n_tokens) FROM cells), 4)
       |    AS token_pct,
       |  avg_chars
       |FROM cells ORDER BY source, lang""".stripMargin

  /** §2.198 near-dup rate by source pair (`dup_rate_by_source`): the
    * §2.22 MinHash pair stream joined to each side's `source`,
    * aggregated per unordered source pair — the dedup QA report that
    * says WHICH crawls duplicate each other (a high same-source rate
    * means a re-crawled dump; a high cross-source rate means mirrors —
    * the decision input for dropping a source wholesale vs pair
    * deduping). Pair share is over total near-dup pairs (1-row
    * broadcast).
    *
    * Scale shape: everything upstream is the banded-LSH machinery
    * (O(n·bands), no all-pairs); the source decoration is two
    * doc-grain hash joins onto the PAIR stream (pair-sized, ≪ corpus)
    * and the rollup is |sources|²-bounded. */
  def dupRateBySource(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val src = docs.select(col("doc_id"), col("source"))
    val pairs = graft.dedup.Dedup.minhashPairs(docs)
    pairs
      .join(src.select(col("doc_id").as("id_a"), col("source").as("sa")), "id_a")
      .join(src.select(col("doc_id").as("id_b"), col("source").as("sb")), "id_b")
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"))
      .crossJoin(broadcast(pairs.agg(count(lit(1)).as("n_total"))))
      .select(col("source_a"), col("source_b"), col("n_pairs"),
        round(col("n_pairs") * 100.0 / col("n_total"), 4).as("pair_pct"))
      .orderBy(desc("n_pairs"), asc("source_a"), asc("source_b"))
  }

  val dupRateBySourceSql: String =
    s"""WITH mp AS (${graft.dedup.Dedup.minhashPairsSql()}),
       |dec AS (SELECT least(da.source, db.source) AS source_a,
       |    greatest(da.source, db.source) AS source_b
       |  FROM mp
       |  JOIN documents da ON mp.id_a = da.doc_id
       |  JOIN documents db ON mp.id_b = db.doc_id)
       |SELECT source_a, source_b, count(*) AS n_pairs,
       |  round(count(*) * 100.0 / (SELECT count(*) FROM mp), 4) AS pair_pct
       |FROM dec GROUP BY 1, 2
       |ORDER BY n_pairs DESC, source_a, source_b""".stripMargin

  /** Candidate minimum-token thresholds for the sweep. */
  val LengthThresholds: Seq[Int] = Seq(10, 25, 50, 100, 200)

  /** §2.199 length-filter threshold sweep (`length_filter_sweep`): for
    * each candidate min-token cutoff, the docs and tokens that would
    * survive — the one-pass grid that picks a length filter WITHOUT
    * re-scanning 100 TB per candidate (the Gopher/CCNet length rules
    * are always tuned this way). One scan to doc-grain token counts,
    * explode over the constant threshold array (×|grid| fanout of a
    * doc-GRAIN frame, not the corpus text), map-side-combined rollup
    * to |grid| rows; totals re-aggregate the same frame and broadcast. */
  def lengthFilterSweep(spark: SparkSession, dir: String): DataFrame = {
    val docToks = Tables.documents(spark, dir)
      .select(size(tokens(col("text"))).cast("long").as("n_toks"))
    val totals = docToks.agg(count(lit(1)).as("t_docs"),
      sum("n_toks").as("t_toks"))
    val kept = docToks
      .select(col("n_toks"),
        explode(array(LengthThresholds.map(lit): _*)).as("min_tokens"))
      .filter(col("n_toks") >= col("min_tokens"))
      .groupBy("min_tokens")
      .agg(count(lit(1)).as("k_docs"), sum("n_toks").as("k_toks"))
    // grid LEFT join so a too-aggressive cutoff reports 0, not a
    // silently missing row — the sweep's point is seeing the cliff
    import spark.implicits._
    LengthThresholds.toDF("min_tokens")
      .join(kept, Seq("min_tokens"), "left")
      .crossJoin(broadcast(totals))
      .select(col("min_tokens"),
        coalesce(col("k_docs"), lit(0L)).as("docs_kept"),
        coalesce(col("k_toks"), lit(0L)).as("tokens_kept"),
        round(coalesce(col("k_docs"), lit(0L)) * 100.0 / col("t_docs"), 4)
          .as("doc_pct"),
        round(coalesce(col("k_toks"), lit(0L)) * 100.0 / col("t_toks"), 4)
          .as("token_pct"))
      .orderBy("min_tokens")
  }

  val lengthFilterSweepSql: String =
    s"""WITH dt AS (SELECT CAST(len(${tokensSql("text")}) AS BIGINT) AS n_toks
       |  FROM documents),
       |tot AS (SELECT count(*) AS t_docs, sum(n_toks) AS t_toks FROM dt),
       |grid AS (SELECT unnest([${LengthThresholds.mkString(", ")}])
       |  AS min_tokens),
       |kept AS (SELECT g.min_tokens AS min_tokens, count(*) AS k_docs,
       |    sum(n_toks) AS k_toks
       |  FROM dt JOIN grid g ON dt.n_toks >= g.min_tokens
       |  GROUP BY 1)
       |SELECT g.min_tokens AS min_tokens,
       |  coalesce(k_docs, 0) AS docs_kept,
       |  CAST(coalesce(k_toks, 0) AS BIGINT) AS tokens_kept,
       |  round(coalesce(k_docs, 0) * 100.0 / t_docs, 4) AS doc_pct,
       |  round(coalesce(k_toks, 0) * 100.0 / t_toks, 4) AS token_pct
       |FROM grid g LEFT JOIN kept ON g.min_tokens = kept.min_tokens, tot
       |ORDER BY min_tokens""".stripMargin

  /** Candidate context lengths audited by [[contextLenSweep]] —
    * power-of-two training sequence lengths spanning the corpus's
    * document-length distribution. */
  val ContextLengths: Seq[Int] = Seq(64, 128, 256, 512, 1024)

  /** §2.309 `context_len_sweep`: max-sequence-length cost table for
    * training-batch construction — for each candidate context length L
    * in [[ContextLengths]], what the two standard packing regimes cost:
    * truncate-and-pad (one doc per sequence — docs longer than L lose
    * their tail, shorter ones pay padding) vs concat-and-chunk (the
    * GPT-style token stream — no loss, no padding, but documents cross
    * sequence boundaries). §2.38 EXECUTES a packing at one fixed L;
    * this is the sweep that picks L, priced on the corpus it will pack
    * — the truncation-share and padding-share columns are the two
    * numbers a pretraining run trades off, read in ONE pass instead of
    * re-tokenizing 100 TB per candidate.
    *
    * Scale shape: the corpus collapses to doc-grain token counts in
    * one scan; the constant |L|-grid explodes THAT frame (the §2.199
    * doc-grain-fanout convention), one map-side-combined groupBy per
    * grid cell; totals are a 1-row broadcast. Grid LEFT join so a
    * degenerate candidate reports 0, not a missing row.
    *
    * Determinism: all-integer — truncation/padding are min/max of
    * integers, sequence counts are ceil by integer arithmetic; the two
    * shares are rounded HALF-UP at 6 dp in pure INTEGER arithmetic
    * ((x·2·10⁶ + d) div 2d) because the round denominators
    * (t_docs·max_len) land exact ties where float round() diverges
    * cross-engine. */
  def contextLenSweep(spark: SparkSession, dir: String): DataFrame = {
    val docToks = Tables.documents(spark, dir)
      .select(size(tokens(col("text"))).cast("long").as("n_toks"))
    val totals = docToks.agg(count(lit(1)).as("t_docs"),
      sum("n_toks").as("t_toks"))
    val cells = docToks
      .select(col("n_toks"),
        explode(array(ContextLengths.map(l => lit(l.toLong)): _*)).as("max_len"))
      .groupBy("max_len").agg(
        sum(when(col("n_toks") > col("max_len"), 1L).otherwise(0L))
          .as("docs_truncated"),
        sum(greatest(lit(0L), col("n_toks") - col("max_len")))
          .as("tokens_truncated"),
        sum(col("max_len") - least(col("n_toks"), col("max_len")))
          .as("pad_tokens"))
    import spark.implicits._
    ContextLengths.map(_.toLong).toDF("max_len")
      .join(cells, Seq("max_len"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("tt", coalesce(col("tokens_truncated"), lit(0L)))
      .withColumn("pt", coalesce(col("pad_tokens"), lit(0L)))
      // shares rounded HALF-UP in pure integer arithmetic: the round
      // denominators (t_docs·max_len) make exact 7th-digit-5 ties
      // common, where the engines' float round() disagree
      .select(col("max_len"),
        coalesce(col("docs_truncated"), lit(0L)).as("docs_truncated"),
        (expr("(tt * 2000000 + t_toks) div (2 * t_toks)")
          .cast("double") / 1000000.0).as("trunc_token_share"),
        (expr("(pt * 2000000 + t_docs * max_len) div " +
          "(2 * t_docs * max_len)").cast("double") / 1000000.0)
          .as("pad_share"),
        col("t_docs").as("seqs_padded"),
        expr("(t_toks + max_len - 1) div max_len").as("seqs_concat"),
        col("t_toks").as("tokens_total"))
      .orderBy("max_len")
  }

  val contextLenSweepSql: String =
    s"""WITH dt AS (SELECT CAST(len(${tokensSql("text")}) AS BIGINT) AS n_toks
       |  FROM documents),
       |tot AS (SELECT count(*) AS t_docs, CAST(sum(n_toks) AS BIGINT)
       |    AS t_toks FROM dt),
       |grid AS (SELECT CAST(unnest([${ContextLengths.mkString(", ")}])
       |  AS BIGINT) AS max_len),
       |cells AS (SELECT g.max_len AS max_len,
       |    CAST(sum(CASE WHEN n_toks > g.max_len THEN 1 ELSE 0 END)
       |      AS BIGINT) AS docs_truncated,
       |    CAST(sum(greatest(0, n_toks - g.max_len)) AS BIGINT)
       |      AS tokens_truncated,
       |    CAST(sum(g.max_len - least(n_toks, g.max_len)) AS BIGINT)
       |      AS pad_tokens
       |  FROM dt CROSS JOIN grid g
       |  GROUP BY 1)
       |SELECT g.max_len AS max_len,
       |  coalesce(docs_truncated, 0) AS docs_truncated,
       |  CAST((coalesce(tokens_truncated, 0) * 2000000 + t_toks)
       |    // (2 * t_toks) AS DOUBLE) / 1000000.0 AS trunc_token_share,
       |  CAST((coalesce(pad_tokens, 0) * 2000000 + t_docs * g.max_len)
       |    // (2 * t_docs * g.max_len) AS DOUBLE) / 1000000.0 AS pad_share,
       |  t_docs AS seqs_padded,
       |  (t_toks + g.max_len - 1) // g.max_len AS seqs_concat,
       |  t_toks AS tokens_total
       |FROM grid g LEFT JOIN cells ON g.max_len = cells.max_len, tot
       |ORDER BY max_len""".stripMargin
  /** §2.314 `loo_source_impact`: leave-one-out data valuation per
    * corpus source — for each source, the corpus mean quality score
    * and mean token count WITHOUT that source, and the impact
    * (overall − leave-one-out: positive = the source pulls the corpus
    * average UP) — the Shapley-zeroth-order answer to "which feed is
    * diluting the corpus", priced per source in ONE pass instead of
    * |S| re-scans of 100 TB (the totals-minus-group identity makes
    * every LOO aggregate free once the per-source cells exist).
    *
    * Scale shape: ONE doc-grain scan → |S| source cells (exact
    * integer e6-score and token sums); totals are windows over the
    * bounded cell frame; every LOO mean is arithmetic on those.
    *
    * Determinism: the 6 dp score carried as exact e6 BIGINTs (§2.225
    * convention); all sums integers; means/impacts fixed-sequence
    * divisions of identical integers, impacts at 8 dp (they sit at
    * ~10⁻⁴); the single-source degenerate is NULL via an INTEGER
    * gate. */
  def looSourceImpact(spark: SparkSession, dir: String): DataFrame = {
    val f = graft.text.TextQueries.qualityFrame(Tables.documents(spark, dir))
      .select(col("source"),
        round(col("quality_score") * 1000000).cast("long").as("s_e6"),
        col("n_tokens").cast("long").as("toks"))
    val cells = f.groupBy("source").agg(
      count(lit(1)).as("n"), sum("s_e6").as("ss"), sum("toks").as("st"))
    val w = Window.partitionBy(lit(1))
    def d(c: Column) = c.cast("double")
    val marked = cells
      .withColumn("tn", sum("n").over(w))
      .withColumn("ts", sum("ss").over(w))
      .withColumn("tt", sum("st").over(w))
    val overallQ = d(col("ts")) / 1000000.0 / d(col("tn"))
    val looQ = d(col("ts") - col("ss")) / 1000000.0 / d(col("tn") - col("n"))
    val overallT = d(col("tt")) / d(col("tn"))
    val looT = d(col("tt") - col("st")) / d(col("tn") - col("n"))
    marked.select(col("source"), col("n").as("n_docs"),
      round(d(col("n")) / d(col("tn")), 6).as("doc_share"),
      round(d(col("ss")) / 1000000.0 / d(col("n")), 6).as("mean_quality"),
      when(col("tn") === col("n"), lit(null).cast("double"))
        .otherwise(round(looQ, 6)).as("loo_quality"),
      when(col("tn") === col("n"), lit(null).cast("double"))
        .otherwise(round(overallQ - looQ, 8)).as("quality_impact"),
      round(d(col("st")) / d(col("n")), 6).as("mean_tokens"),
      when(col("tn") === col("n"), lit(null).cast("double"))
        .otherwise(round(overallT - looT, 8)).as("token_impact"))
      .orderBy("source")
  }

  val looSourceImpactSql: String = {
    import graft.text.TextQueries.stopListSql
    s"""WITH f AS (SELECT source,
       |    CAST(round(round(0.4 * (length(regexp_replace(text, '[^a-z]', '', 'g')) / length(text))
       |      + 0.4 * (1.0 - abs(len(list_filter(_toks, t -> t IN ($stopListSql))) / n_tokens - 0.3))
       |      + 0.2 * least(1.0, n_tokens / 100.0), 6) * 1000000) AS BIGINT) AS s_e6,
       |    CAST(n_tokens AS BIGINT) AS toks
       |  FROM (SELECT source, text, string_split_regex(trim(text), '\\s+') AS _toks,
       |          CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS n_tokens
       |        FROM documents) t),
       |cells AS (SELECT source, count(*) AS n,
       |    CAST(sum(s_e6) AS BIGINT) AS ss, CAST(sum(toks) AS BIGINT) AS st
       |  FROM f GROUP BY 1),
       |marked AS (SELECT source, n, ss, st,
       |    CAST(sum(n) OVER () AS BIGINT) AS tn,
       |    CAST(sum(ss) OVER () AS BIGINT) AS ts,
       |    CAST(sum(st) OVER () AS BIGINT) AS tt
       |  FROM cells)
       |SELECT source, n AS n_docs,
       |  round(CAST(n AS DOUBLE) / tn, 6) AS doc_share,
       |  round(CAST(ss AS DOUBLE) / 1000000.0 / n, 6) AS mean_quality,
       |  CASE WHEN tn = n THEN NULL ELSE
       |    round(CAST(ts - ss AS DOUBLE) / 1000000.0 / (tn - n), 6)
       |  END AS loo_quality,
       |  CASE WHEN tn = n THEN NULL ELSE
       |    round(CAST(ts AS DOUBLE) / 1000000.0 / tn
       |      - CAST(ts - ss AS DOUBLE) / 1000000.0 / (tn - n), 8)
       |  END AS quality_impact,
       |  round(CAST(st AS DOUBLE) / n, 6) AS mean_tokens,
       |  CASE WHEN tn = n THEN NULL ELSE
       |    round(CAST(tt AS DOUBLE) / tn
       |      - CAST(tt - st AS DOUBLE) / (tn - n), 8)
       |  END AS token_impact
       |FROM marked ORDER BY source""".stripMargin
  }

  /** §2.358 `chao1_vocab`: per-language unseen-vocabulary estimation —
    * Chao1 richness (V + f₁(f₁−1)/(2(f₂+1)), the bias-corrected form
    * that is defined at f₂ = 0) and Good–Turing sample coverage
    * (1 − f₁/N). The corpus-growth planning number next to §2.294's
    * Heaps fit: Heaps extrapolates HOW FAST vocabulary grows, Chao1
    * says how much is MISSING from the current sample — the "is this
    * language's crawl saturated?" gate a data-mixture team reads
    * before buying more of a source.
    *
    * Scale shape: one explode→(lang, term) map-side-combined count
    * (the §2.88 vocab machinery), then the f₁/f₂/V aggregate is
    * ≤|vocab| rows and the report is |langs| rows. Determinism: V,
    * f₁, f₂, N are exact integers; chao1/coverage are one fixed
    * expression of identical integers (f₁(f₁−1) as double — exact
    * below 2^53, i.e. to f₁ ≈ 9·10⁷ singleton terms per language,
    * orders above any tokenizer's real vocabulary). */
  def chao1Vocab(spark: SparkSession, dir: String): DataFrame = {
    val terms = Tables.documents(spark, dir)
      .select(col("lang"), explode(tokens(lower(col("text")))).as("term"))
      .filter(col("term") =!= "")
    val counts = terms.groupBy("lang", "term").agg(count(lit(1)).as("n"))
    counts.groupBy("lang")
      .agg(sum("n").as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("n") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("lang"), col("n_tokens"), col("vocab"), col("f1"), col("f2"),
        round(col("vocab") +
          col("f1").cast("double") * (col("f1") - 1) / ((col("f2") + 1) * 2.0),
          6).as("chao1"),
        round(lit(1.0) - col("f1").cast("double") / col("n_tokens"), 6)
          .as("coverage"))
      .orderBy("lang")
  }

  val chao1VocabSql: String =
    s"""WITH terms AS (SELECT lang, term FROM (
       |    SELECT lang, unnest(${tokensSql("lower(text)")}) AS term
       |    FROM documents) t
       |  WHERE term != ''),
       |counts AS (SELECT lang, term, count(*) AS n FROM terms GROUP BY 1, 2)
       |SELECT lang, CAST(sum(n) AS BIGINT) AS n_tokens,
       |  count(*) AS vocab,
       |  CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
       |  CAST(sum(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
       |  round(count(*) +
       |    CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
       |      * (sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) - 1)
       |      / (2.0 * (sum(CASE WHEN n = 2 THEN 1 ELSE 0 END) + 1)), 6)
       |    AS chao1,
       |  round(1.0 - CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / sum(n), 6) AS coverage
       |FROM counts GROUP BY 1 ORDER BY 1""".stripMargin
}
