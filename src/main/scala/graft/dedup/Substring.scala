package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextFunctions._

/** §2.129/132 span-level duplicated-text detection — the substring
  * (k-token-gram) complement to the whole-document dedup family.
  *
  * Whole-doc dedup (exact/MinHash/SimHash) misses the dominant
  * real-corpus failure: boilerplate SPANS repeated across otherwise
  * distinct documents (headers, license blocks, templated paragraphs).
  * The published remedy (suffix-array substring dedup) keys on every
  * duplicated window; the distributed formulation here anchors on
  * k-token grams: a duplicated span of length ≥ k contains a
  * duplicated k-gram, so per-doc duplicated-gram statistics score
  * exactly the text a span-level dedup would cut (reference test
  * corpus: the ETL's track rows carry templated artist/album text; see
  * spotify-tracks-etl-portfolio/tests/test_transform.py fixtures).
  *
  * Gram identity is the arithmetic k-window poly hash over compiled
  * per-token hashes ([[graft.functions.TokenPolyHashes]] /
  * ShinglePolyHashes — the §6 round-1 lesson: md5 over
  * string-concatenated shingles runs through interpreted HOF lambdas
  * and costs ~20× per corpus pass; measured here 19 s → 2.6 s at sf1).
  * Hash collisions (~n²/2M across the corpus vocabulary) can mark a
  * gram duplicated spuriously at ppm rates — the standard fingerprint
  * trade every hash-anchored dedup in this library makes, and the
  * DuckDB oracle replays the identical hash so verification is exact.
  *
  * Scale shape (the tfidf/df design, one corpus scan): the gram stream
  * collapses FIRST to per-(doc, gram) counts — map-side-combined
  * groupBy, the only corpus-sized shuffle — and corpus-wide totals
  * derive from THAT frame (vocabulary-sized, no second scan). The
  * totals join back on gram hash: hash-partitioned on the same key the
  * per-doc frame was just shuffled by, and only grams with total ≥ 2
  * survive onto the join. Integer counts end-to-end; doubles appear
  * only in the final ratio.
  */
object Substring {

  val GramK = 8

  /** (doc_id, n_tokens, p, h): position-indexed k-gram hashes. */
  private def grams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        graft.functions.native.token_poly_hashes(col("text")).as("th"))
      .select(col("doc_id"), size(col("th")).as("n_tokens"),
        posexplode(graft.functions.native.shingle_hashes(col("th"), GramK)))
      .toDF("doc_id", "n_tokens", "p", "h")

  private val gramsSql: String =
    s"""SELECT doc_id, len(th) AS n_tokens,
       |  generate_subscripts(${shingleHashCombineSql("th", GramK)}, 1) AS p,
       |  unnest(${shingleHashCombineSql("th", GramK)}) AS h
       |FROM (SELECT doc_id, ${tokenHashesSql("text")} AS th FROM documents) t""".stripMargin

  /** Per-document duplicated-gram statistics: of the doc's k-token
    * gram starts, how many recur (count ≥ 2) corpus-wide — within-doc
    * repeats included, exactly like the suffix-array criterion. */
  def dedupSubstring(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // per-(doc, gram) occurrence counts: the one corpus-sized shuffle
    val dg = grams(docs).groupBy("doc_id", "h").agg(count(lit(1)).as("c"))
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

  val dedupSubstringSql: String =
    s"""WITH grams AS ($gramsSql),
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

  /** §2.132 merged duplicated-SPAN coverage — the follow-through on
    * [[dedupSubstring]]: the gram-level dup fraction counts anchor
    * STARTS, but the metric span-level dedup actually cuts on is the
    * union of the duplicated windows. Each duplicated k-gram start p
    * covers tokens [p, p+k−1]; overlapping/adjacent windows merge into
    * maximal spans (gaps-and-islands: a window opens a new island iff
    * its start exceeds the running max end of everything before it),
    * giving per doc the exact duplicated-token coverage a cut would
    * remove.
    *
    * Scale shape: the gram/total machinery is [[dedupSubstring]]'s;
    * duplicated starts are recovered with a leftsemi join (totals
    * never widen rows) and the island assignment is ONE window pass
    * partitioned by doc_id ordered by position — per-doc sequential
    * work bounded by doc length, the same per-key window class as
    * window_running, over only the duplicated starts (≈ 8% of gram
    * volume at sf1). */
  def dupSpans(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val g = grams(docs)
    val totals = g.groupBy("h").agg(count(lit(1)).as("total"))
      .filter(col("total") >= 2)
    // duplicated window starts only (leftsemi: totals never widen rows)
    val dup = g.join(totals, Seq("h"), "leftsemi")
    val wPrev = Window.partitionBy("doc_id").orderBy("p")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("doc_id").orderBy("p")
      .rowsBetween(Window.unboundedPreceding, 0)
    val islands = dup
      .withColumn("new_island",
        when(col("p") > coalesce(max(col("p") + lit(GramK - 1)).over(wPrev),
          lit(-1L)), 1L).otherwise(0L))
      .withColumn("island", sum("new_island").over(wRun))
    val perDoc = islands.groupBy("doc_id", "n_tokens", "island")
      .agg(min("p").as("s"), max(col("p") + lit(GramK - 1)).as("e"))
      .groupBy("doc_id", "n_tokens")
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("e") - col("s") + 1).as("covered_tokens"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        coalesce(round(col("covered_tokens").cast("double") /
          col("n_tokens").cast("double"), 6), lit(0.0)).as("coverage_frac"))
      .orderBy("doc_id")
  }

  val dupSpansSql: String =
    s"""WITH grams AS ($gramsSql),
       |totals AS (SELECT h FROM grams GROUP BY h HAVING count(*) >= 2),
       |dup AS (SELECT g.doc_id, g.n_tokens, g.p FROM grams g
       |        WHERE g.h IN (SELECT h FROM totals)),
       |isl AS (SELECT doc_id, n_tokens, p,
       |    CAST(sum(new_island) OVER (PARTITION BY doc_id ORDER BY p
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
       |  FROM (SELECT doc_id, n_tokens, p,
       |      CASE WHEN p > coalesce(max(p + ${GramK - 1}) OVER (
       |          PARTITION BY doc_id ORDER BY p
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
       |        THEN 1 ELSE 0 END AS new_island
       |    FROM dup) t),
       |spans AS (SELECT doc_id, n_tokens, island,
       |    min(p) AS s, max(p + ${GramK - 1}) AS e
       |  FROM isl GROUP BY 1, 2, 3),
       |per_doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
       |    CAST(sum(e - s + 1) AS BIGINT) AS covered_tokens,
       |    any_value(n_tokens) AS n_tokens
       |  FROM spans GROUP BY doc_id)
       |SELECT d.doc_id,
       |  coalesce(n_dup_spans, 0) AS n_dup_spans,
       |  coalesce(covered_tokens, 0) AS covered_tokens,
       |  coalesce(round(CAST(covered_tokens AS DOUBLE) /
       |    CAST(n_tokens AS DOUBLE), 6), 0.0) AS coverage_frac
       |FROM documents d LEFT JOIN per_doc USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** §2.331 `dup_spans_cut`: the CUT LIST [[dupSpans]] stops short of
    * — production span-level dedup (ExactSubstr, Lee et al. "Dedup-
    * licating Training Data Makes Language Models Better") doesn't
    * report coverage, it REMOVES the duplicated ranges. Per document
    * with duplicated spans: each maximal span as an explicit 1-based
    * token range [cut_start, cut_end] (ordered, `span_idx`), plus the
    * post-cut document summarized exactly — kept-token count and a
    * residual fingerprint (sum of the kept tokens' poly hashes —
    * order-free, exact BIGINT: ≤ doc_len · 1e9+7 ≪ 2^63) so a
    * downstream writer can verify the cut doc it materializes.
    *
    * Token coverage is NOT a token×span range join: dup gram starts
    * land back on the token stream via one (doc_id, p) equi-join, and
    * "token q is covered" becomes "some dup start lies in
    * [q−k+1, q]" — a rows-window max over the DENSE position stream
    * (every token has a row, so ROWS offsets ≡ position offsets).
    * Scale shape: the gram machinery is [[dupSpans]]'s; on top ride
    * one corpus-sized equi-join, one doc-partitioned window (shared
    * sort class), and a doc-grain join of the bounded span frame. */
  def dupSpansCut(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val base = docs.select(col("doc_id"),
      graft.functions.native.token_poly_hashes(col("text")).as("th"))
    val g = base.select(col("doc_id"),
        posexplode(graft.functions.native.shingle_hashes(col("th"), GramK)))
      .toDF("doc_id", "p", "h")
    val totals = g.groupBy("h").agg(count(lit(1)).as("total"))
      .filter(col("total") >= 2)
    val dupStarts = g.join(totals, Seq("h"), "leftsemi").select("doc_id", "p")
    // maximal spans (gaps-and-islands, exactly dupSpans's assignment)
    val wPrev = Window.partitionBy("doc_id").orderBy("p")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("doc_id").orderBy("p")
      .rowsBetween(Window.unboundedPreceding, 0)
    val spans = dupStarts
      .withColumn("new_island",
        when(col("p") > coalesce(max(col("p") + lit(GramK - 1)).over(wPrev),
          lit(-1L)), 1L).otherwise(0L))
      .withColumn("island", sum("new_island").over(wRun))
      .groupBy("doc_id", "island")
      .agg(min("p").as("s"), max(col("p") + lit(GramK - 1)).as("e"))
    // post-cut doc: covered iff a dup start lies within the last k
    // token positions (dense stream → ROWS window ≡ position window)
    val toks = base.select(col("doc_id"), size(col("th")).as("n_tokens"),
        posexplode(col("th"))).toDF("doc_id", "n_tokens", "p", "tok_h")
    val wCov = Window.partitionBy("doc_id").orderBy("p")
      .rowsBetween(-(GramK - 1), 0)
    val kept = toks
      .join(dupStarts.withColumn("is_start", lit(1)), Seq("doc_id", "p"), "left")
      .withColumn("covered",
        max(when(col("is_start") === 1, col("p"))).over(wCov).isNotNull)
      .groupBy("doc_id")
      .agg(any_value(col("n_tokens")).as("n_tokens"),
        sum(when(!col("covered"), 1L).otherwise(0L)).as("kept_tokens"),
        coalesce(sum(when(!col("covered"), col("tok_h"))), lit(0L))
          .as("residual_fp"))
    val wIdx = Window.partitionBy("doc_id").orderBy("s")
    spans.join(kept, "doc_id")
      .select(col("doc_id"),
        row_number().over(wIdx).cast("long").as("span_idx"),
        (col("s") + 1).cast("long").as("cut_start"),
        (col("e") + 1).cast("long").as("cut_end"),
        (col("e") - col("s") + 1).cast("long").as("span_tokens"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("kept_tokens"), col("residual_fp"))
      .orderBy("doc_id", "span_idx")
  }

  val dupSpansCutSql: String =
    s"""WITH grams AS ($gramsSql),
       |totals AS (SELECT h FROM grams GROUP BY h HAVING count(*) >= 2),
       |dup AS (SELECT g.doc_id, g.p FROM grams g
       |        WHERE g.h IN (SELECT h FROM totals)),
       |isl AS (SELECT doc_id, p,
       |    CAST(sum(new_island) OVER (PARTITION BY doc_id ORDER BY p
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
       |  FROM (SELECT doc_id, p,
       |      CASE WHEN p > coalesce(max(p + ${GramK - 1}) OVER (
       |          PARTITION BY doc_id ORDER BY p
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
       |        THEN 1 ELSE 0 END AS new_island
       |    FROM dup) t),
       |spans AS (SELECT doc_id, island, min(p) AS s, max(p + ${GramK - 1}) AS e
       |  FROM isl GROUP BY 1, 2),
       |toks AS (SELECT doc_id, CAST(len(th) AS BIGINT) AS n_tokens,
       |    generate_subscripts(th, 1) AS p, unnest(th) AS tok_h
       |  FROM (SELECT doc_id, ${tokenHashesSql("text")} AS th FROM documents) t),
       |cov AS (SELECT t.doc_id, t.n_tokens, t.p, t.tok_h,
       |    max(CASE WHEN d.p IS NOT NULL THEN t.p END) OVER (
       |      PARTITION BY t.doc_id ORDER BY t.p
       |      ROWS BETWEEN ${GramK - 1} PRECEDING AND CURRENT ROW) IS NOT NULL
       |      AS covered
       |  FROM toks t LEFT JOIN dup d ON t.doc_id = d.doc_id AND t.p = d.p),
       |kept AS (SELECT doc_id, any_value(n_tokens) AS n_tokens,
       |    CAST(sum(CASE WHEN NOT covered THEN 1 ELSE 0 END) AS BIGINT)
       |      AS kept_tokens,
       |    CAST(coalesce(sum(CASE WHEN NOT covered THEN tok_h END), 0) AS BIGINT)
       |      AS residual_fp
       |  FROM cov GROUP BY doc_id)
       |SELECT s.doc_id,
       |  CAST(row_number() OVER (PARTITION BY s.doc_id ORDER BY s.s) AS BIGINT)
       |    AS span_idx,
       |  CAST(s.s AS BIGINT) AS cut_start, CAST(s.e AS BIGINT) AS cut_end,
       |  CAST(s.e - s.s + 1 AS BIGINT) AS span_tokens,
       |  k.n_tokens, k.kept_tokens, k.residual_fp
       |FROM spans s JOIN kept k ON s.doc_id = k.doc_id
       |ORDER BY s.doc_id, span_idx""".stripMargin

  /** CDC boundary divisor: a token opens a new chunk when its compiled
    * poly hash ≡ 0 (mod this), giving ~[[CdcDivisor]]-token expected
    * chunks — the content-defined analogue of fixed windows. */
  val CdcDivisor = 32

  /** §2.233 `dedup_cdc`: content-defined-chunking dedup — the
    * rsync/LBFS/backup-dedup technique applied to text: chunk
    * boundaries are CONTENT positions (token hash ≡ 0 mod
    * [[CdcDivisor]]), so an insertion early in a document shifts
    * every FIXED window (§2.117's chunks all change) but leaves all
    * later CDC chunks byte-identical — exactly why dedup storage uses
    * it. Each chunk fingerprints to md5 over its ordered token
    * hashes; chunks recurring corpus-wide (count ≥ 2) are duplicated
    * content, reported per doc as chunk counts + duplicated-token
    * coverage.
    *
    * Scale shape: the token stream carries ONE corpus-sized shuffle
    * (the (doc, chunk) groupBy); the boundary flag is row-local, the
    * chunk id a per-doc running count (one doc-partitioned window —
    * the §2.134 shared-sort class), and the signature-total frame is
    * chunk-vocabulary-sized, joined back hash-partitioned. Chunk
    * length is content-bounded (expected [[CdcDivisor]] tokens,
    * hard-capped by doc length like every per-doc structure here).
    *
    * Determinism: signatures are md5 over comma-joined BIGINT hashes
    * in position order — string-exact on both engines; counts are
    * integers; the one ratio rounds at 6 dp. */
  def dedupCdc(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.native.token_poly_hashes(col("text")).as("th"))
      .select(col("doc_id"), posexplode(col("th")))
      .toDF("doc_id", "p", "th")
    val w = Window.partitionBy("doc_id").orderBy("p")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val chunks = toks
      .withColumn("b", when(pmod(col("th"), lit(CdcDivisor)) === 0, 1L)
        .otherwise(0L))
      .withColumn("cid", sum("b").over(w))
      .groupBy("doc_id", "cid")
      .agg(count(lit(1)).as("n_toks"),
        expr("""md5(array_join(transform(
          sort_array(collect_list(struct(p, th))),
          s -> CAST(s.th AS STRING)), ','))""").as("sig"))
    val totals = chunks.groupBy("sig").agg(count(lit(1)).as("total"))
    // shuffle_hash pin: totals is chunk-vocabulary-sized — DATA-
    // PROPORTIONAL — but sf-scale stats read it as broadcastable
    // (observed: BroadcastExchange in the sf1 executed plan). At
    // 100 TB the signature vocabulary is billions of rows; pin the
    // join to the hash exchange both sides already share on sig
    // (the §2.153 dedup_containment trap class).
    chunks.join(totals.hint("shuffle_hash"), "sig")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("total") >= 2, 1L).otherwise(0L)).as("dup_chunks"),
        sum("n_toks").as("n_tokens"),
        sum(when(col("total") >= 2, col("n_toks")).otherwise(0L))
          .as("dup_tokens"))
      .withColumn("dup_coverage",
        round(col("dup_tokens").cast("double") / col("n_tokens"), 6))
      .select("doc_id", "n_chunks", "dup_chunks", "n_tokens",
        "dup_tokens", "dup_coverage")
      .orderBy("doc_id")
  }

  val dedupCdcSql: String =
    s"""WITH toks AS (SELECT doc_id,
       |    generate_subscripts(th, 1) AS p, unnest(th) AS th
       |  FROM (SELECT doc_id, ${tokenHashesSql("text")} AS th
       |        FROM documents) t),
       |flagged AS (SELECT doc_id, p, th,
       |    CAST(sum(CASE WHEN th % $CdcDivisor = 0 THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY p
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS cid
       |  FROM toks),
       |chunks AS (SELECT doc_id, cid, count(*) AS n_toks,
       |    md5(string_agg(CAST(th AS VARCHAR), ',' ORDER BY p)) AS sig
       |  FROM flagged GROUP BY 1, 2),
       |tot AS (SELECT sig, count(*) AS total FROM chunks GROUP BY 1)
       |SELECT doc_id, count(*) AS n_chunks,
       |  CAST(sum(CASE WHEN total >= 2 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS dup_chunks,
       |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN total >= 2 THEN n_toks ELSE 0 END) AS BIGINT)
       |    AS dup_tokens,
       |  round(CAST(sum(CASE WHEN total >= 2 THEN n_toks ELSE 0 END)
       |      AS DOUBLE) / sum(n_toks), 6) AS dup_coverage
       |FROM chunks JOIN tot USING (sig)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
