package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Probabilistic record linkage + blocking-scheme evaluation —
  * SURVEY.md §2.335 / §2.336.
  *
  * Entity resolution at corpus scale has two halves: a BLOCKING scheme
  * that turns the O(n²) pair space into an equi-join (§2.127's
  * deletion neighborhood is one), and a SCORING model that decides
  * which candidate pairs are the same entity. Fellegi–Sunter (JASA
  * 1969) is the standard scorer: per comparison field, the odds that
  * the field agrees on a true match (m) vs on a non-match (u), and a
  * pair's evidence is the sum of per-field log₂(m/u) (agree) or
  * log₂((1−m)/(1−u)) (disagree) weights. `blocking_eval` prices the
  * blocking half: pair completeness (what share of true matches the
  * blocker even presents) vs reduction ratio (what share of the n²
  * pair space it prunes) — the two numbers every ER paper reports
  * (Christen 2012).
  *
  * Fixture: the corpus carries no labeled duplicate pairs, so a DIRTY
  * twin of the customer table is synthesized IN-QUERY by deterministic
  * per-custkey rules (the §2.329 in-query-fixture precedent — both
  * engines compute the identical twin): custkey%5=0 drops the name's
  * last char, %5=1 shifts the nation, %5=2 reverses the segment,
  * %5=3 drops the name's first char AND shifts the balance band, %5=4
  * is untouched. Ground truth is then free (clean.id = dirty.id), the
  * name perturbations stay within edit distance 1 (so the
  * deletion-neighborhood blocker is provably complete on matches),
  * and every agreement field has both agreeing and disagreeing mass.
  */
object Linkage {

  /** Clean comparison view: (id, name, nation, seg, band). Band is the
    * §2.221 fixed-width balance band (floor to 1000s) — fixed edges,
    * stable as the corpus grows. */
  private def clean(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(
      col("c_custkey").as("id"), col("c_name").as("name"),
      col("c_nationkey").cast("long").as("nation"),
      col("c_mktsegment").as("seg"),
      floor(col("c_acctbal") / 1000.0).cast("long").as("band"))

  /** Deterministic dirty twin (see object doc). Perturbation class =
    * custkey mod 5; every rule is a pure codegen'd expression that
    * DuckDB replays verbatim. */
  private def dirty(spark: SparkSession, dir: String): DataFrame = {
    val m = col("id") % 5
    clean(spark, dir)
      .withColumn("name", when(m === 0,
          expr("substring(name, 1, length(name) - 1)"))
        .when(m === 3, expr("substring(name, 2, length(name))"))
        .otherwise(col("name")))
      .withColumn("nation", when(m === 1, (col("nation") + 7) % 25)
        .otherwise(col("nation")))
      .withColumn("seg", when(m === 2, reverse(col("seg")))
        .otherwise(col("seg")))
      .withColumn("band", when(m === 3, col("band") + 1)
        .otherwise(col("band")))
  }

  /** The dirty twin as SQL, over the aliased clean view `c`. */
  private val dirtySqlBody: String =
    """SELECT id,
      |    CASE WHEN id % 5 = 0 THEN substr(name, 1, length(name) - 1)
      |         WHEN id % 5 = 3 THEN substr(name, 2)
      |         ELSE name END AS name,
      |    CASE WHEN id % 5 = 1 THEN (nation + 7) % 25
      |         ELSE nation END AS nation,
      |    CASE WHEN id % 5 = 2 THEN reverse(seg) ELSE seg END AS seg,
      |    CASE WHEN id % 5 = 3 THEN band + 1 ELSE band END AS band
      |  FROM clean""".stripMargin

  private val cleanSqlBody: String =
    """SELECT c_custkey AS id, c_name AS name,
      |    CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS seg,
      |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band
      |  FROM customer""".stripMargin

  /** Deletion-neighborhood keys in DuckDB — the SQL twin of
    * [[Fuzzy.withDeletionKeys]] (same same-char-run suppression).
    * concat(), not `||`: the composed query is stripMargin'd once more
    * by [[withCtes]], and a line-leading `||` would lose a pipe. */
  private def keysSql(src: String): String =
    s"""SELECT id, name, nation, seg, band,
       |    CASE WHEN pos < 0 THEN name
       |         ELSE concat(substr(name, 1, CAST(pos AS INTEGER)),
       |           substr(name, CAST(pos AS INTEGER) + 2)) END AS bkey
       |  FROM $src, unnest(range(-1, CAST(length(name) AS BIGINT)))
       |    AS t(pos)
       |  WHERE pos <= 0
       |    OR substr(name, CAST(pos AS INTEGER) + 1, 1)
       |      <> substr(name, CAST(pos AS INTEGER), 1)""".stripMargin

  /** Candidate pairs clean×dirty within edit distance 1, via the
    * deletion-neighborhood equi-join (complete for lev ≤ 1, §2.127),
    * verified by the compiled bound-1 kernel. Distinct pairs carry
    * both sides' comparison fields. */
  private def candidates(spark: SparkSession, dir: String): DataFrame = {
    // repartition the narrow pre-explosion rows (the §2.127 rule: the
    // ×len key explosion must not run at raw-scan parallelism)
    val ck = Fuzzy.withDeletionKeys(clean(spark, dir).repartition(), "name")
    val dk = Fuzzy.withDeletionKeys(dirty(spark, dir).repartition(), "name")
    // SHUFFLE_HASH pinned for the same reason as §2.127: both key
    // frames are corpus-sized but stats-derived from narrow scans, so
    // the planner would broadcast one side (OOM at scale) and run the
    // probe at scan parallelism.
    //
    // r14 (guide §2.3 project-before-the-exchange): the agreement
    // FLAGS are pure per-pair functions of the joined fields, so they
    // are computed INSIDE the join stage and only (id_a, id_b, five
    // 0/1 longs) crosses the dedup exchange — the previous shape
    // shipped both names + all fields through dropDuplicates (22 MB
    // vs 9 MB shuffle at sf0.1, stage-profiled). Duplicate bkey hits
    // of one pair carry identical flags, so which row survives the
    // dedup cannot change the result.
    ck.alias("a")
      .join(dk.hint("shuffle_hash").alias("b"), Seq("bkey"))
      .withColumn("dist",
        graft.functions.native.bounded_lev1(col("a.name"), col("b.name")))
      .filter(col("dist") >= 0)
      .select(
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        when(col("dist") === 0, 1L).otherwise(0L).as("name_ex"),
        when(col("a.nation") === col("b.nation"), 1L).otherwise(0L)
          .as("nat_ag"),
        when(col("a.seg") === col("b.seg"), 1L).otherwise(0L).as("seg_ag"),
        when(col("a.band") === col("b.band"), 1L).otherwise(0L)
          .as("band_ag"),
        when(col("a.id") === col("b.id"), 1L).otherwise(0L).as("is_match"))
      .dropDuplicates("id_a", "id_b")
  }

  private val candidatesSql: String =
    s"""candidates AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       |      a.name AS name_a, b.name AS name_b,
       |      a.nation AS nation_a, b.nation AS nation_b,
       |      a.seg AS seg_a, b.seg AS seg_b,
       |      a.band AS band_a, b.band AS band_b
       |    FROM ckeys a JOIN dkeys b ON a.bkey = b.bkey
       |    WHERE levenshtein(a.name, b.name) <= 1)""".stripMargin

  private def withCtes(body: String): String =
    s"""WITH clean AS ($cleanSqlBody),
       |dirty AS ($dirtySqlBody),
       |ckeys AS (${keysSql("clean")}),
       |dkeys AS (${keysSql("dirty")}),
       |$candidatesSql
       |$body""".stripMargin

  /** §2.335 `record_linkage`: Fellegi–Sunter weights over the
    * candidate pairs, reported per agreement PATTERN (name-exact,
    * nation, segment, band agree flags → ≤16 rows): pair count, true
    * matches (id_a = id_b — free from the fixture), match rate, and
    * the FS log₂ weight assembled from m/u probabilities estimated on
    * the labeled candidate population.
    *
    * Scale shape: the corpus-sized candidate join collapses in ONE
    * map-side groupBy to the ≤16-row pattern frame; every m/u count
    * is a window sum OVER that bounded frame (no second pass over the
    * pairs); the weight is pattern-grain arithmetic.
    *
    * Determinism: all counts exact BIGINTs; each log term's argument
    * is a RATIO OF INTEGER-VALUED DOUBLES combined in one fixed
    * sequence (the §2.324 integer-log-args convention; ratios instead
    * of cross-products so no count product can exceed 2⁵³ at scale);
    * terms are summed in fixed field order and rounded at 6 dp.
    * Degenerate m/u masses (a field that never agrees/disagrees in
    * either class) INTEGER-gate the weight to NULL — never a log(0)
    * or x/0 under ANSI mode. */
  def recordLinkage(spark: SparkSession, dir: String): DataFrame = {
    val pats = candidates(spark, dir)
      .groupBy("name_ex", "nat_ag", "seg_ag", "band_ag")
      .agg(count(lit(1)).as("n_pairs"), sum("is_match").as("n_match"))
    val w = Window.partitionBy(lit(1))
    def agreeSum(flag: String, cnt: Column): Column =
      sum(when(col(flag) === 1L, cnt).otherwise(0L)).over(w)
    val tm = sum("n_match").over(w)
    val tu = (sum("n_pairs").over(w) - tm).as("tu")
    val staged = pats
      .withColumn("tm", tm).withColumn("tu", tu)
      .withColumn("unm", col("n_pairs") - col("n_match"))
    val withMu = Seq("name_ex", "nat_ag", "seg_ag", "band_ag")
      .foldLeft(staged) { (df, f) =>
        df.withColumn(s"ma_$f", agreeSum(f, col("n_match")))
          .withColumn(s"ua_$f", agreeSum(f, col("unm")))
      }
    def dbl(c: Column): Column = c.cast("double")
    // per-field log term: agree → log2(m/u), disagree → log2((1-m)/(1-u));
    // m = ma/tm, u = ua/tu, so m/u = (ma/tm)/(ua/tu) — two divisions of
    // integer-valued doubles, then one log: a fixed sequence on both
    // engines with no >2^53 cross-product.
    def term(f: String): Column = {
      val ma = col(s"ma_$f"); val ua = col(s"ua_$f")
      val md = col("tm") - ma; val ud = col("tu") - ua
      when(col(f) === 1L,
        when(ma > 0L && ua > 0L,
          log(dbl(ma) / dbl(col("tm")) / (dbl(ua) / dbl(col("tu")))) /
            log(lit(2.0))))
        .otherwise(
          when(md > 0L && ud > 0L,
            log(dbl(md) / dbl(col("tm")) / (dbl(ud) / dbl(col("tu")))) /
              log(lit(2.0))))
    }
    withMu
      .withColumn("fs_weight", when(col("tm") > 0L && col("tu") > 0L,
        round(term("name_ex") + term("nat_ag") + term("seg_ag") +
          term("band_ag"), 6)))
      .withColumn("match_rate",
        round(dbl(col("n_match")) / dbl(col("n_pairs")), 6))
      .select("name_ex", "nat_ag", "seg_ag", "band_ag", "n_pairs",
        "n_match", "match_rate", "fs_weight")
      .orderBy("name_ex", "nat_ag", "seg_ag", "band_ag")
  }

  val recordLinkageSql: String = withCtes(
    """, pats AS (
      |  SELECT CASE WHEN name_a = name_b THEN 1 ELSE 0 END AS name_ex,
      |      CASE WHEN nation_a = nation_b THEN 1 ELSE 0 END AS nat_ag,
      |      CASE WHEN seg_a = seg_b THEN 1 ELSE 0 END AS seg_ag,
      |      CASE WHEN band_a = band_b THEN 1 ELSE 0 END AS band_ag,
      |      CASE WHEN id_a = id_b THEN 1 ELSE 0 END AS is_match
      |    FROM candidates),
      |grp AS (SELECT name_ex, nat_ag, seg_ag, band_ag,
      |    count(*) AS n_pairs, CAST(sum(is_match) AS BIGINT) AS n_match
      |  FROM pats GROUP BY 1, 2, 3, 4),
      |mu AS (SELECT *,
      |    CAST(sum(n_match) OVER () AS BIGINT) AS tm,
      |    CAST(sum(n_pairs - n_match) OVER () AS BIGINT) AS tu,
      |    CAST(sum(CASE WHEN name_ex = 1 THEN n_match ELSE 0 END) OVER ()
      |      AS BIGINT) AS ma_name_ex,
      |    CAST(sum(CASE WHEN name_ex = 1 THEN n_pairs - n_match ELSE 0 END)
      |      OVER () AS BIGINT) AS ua_name_ex,
      |    CAST(sum(CASE WHEN nat_ag = 1 THEN n_match ELSE 0 END) OVER ()
      |      AS BIGINT) AS ma_nat_ag,
      |    CAST(sum(CASE WHEN nat_ag = 1 THEN n_pairs - n_match ELSE 0 END)
      |      OVER () AS BIGINT) AS ua_nat_ag,
      |    CAST(sum(CASE WHEN seg_ag = 1 THEN n_match ELSE 0 END) OVER ()
      |      AS BIGINT) AS ma_seg_ag,
      |    CAST(sum(CASE WHEN seg_ag = 1 THEN n_pairs - n_match ELSE 0 END)
      |      OVER () AS BIGINT) AS ua_seg_ag,
      |    CAST(sum(CASE WHEN band_ag = 1 THEN n_match ELSE 0 END) OVER ()
      |      AS BIGINT) AS ma_band_ag,
      |    CAST(sum(CASE WHEN band_ag = 1 THEN n_pairs - n_match ELSE 0 END)
      |      OVER () AS BIGINT) AS ua_band_ag
      |  FROM grp)
      |SELECT name_ex, nat_ag, seg_ag, band_ag, n_pairs, n_match,
      |  round(CAST(n_match AS DOUBLE) / CAST(n_pairs AS DOUBLE), 6)
      |    AS match_rate,
      |  CASE WHEN tm > 0 AND tu > 0 THEN round(
      |    (CASE WHEN name_ex = 1 THEN
      |        CASE WHEN ma_name_ex > 0 AND ua_name_ex > 0 THEN
      |          ln(CAST(ma_name_ex AS DOUBLE) / CAST(tm AS DOUBLE)
      |            / (CAST(ua_name_ex AS DOUBLE) / CAST(tu AS DOUBLE)))
      |          / ln(2.0) END
      |      ELSE CASE WHEN tm - ma_name_ex > 0 AND tu - ua_name_ex > 0 THEN
      |          ln(CAST(tm - ma_name_ex AS DOUBLE) / CAST(tm AS DOUBLE)
      |            / (CAST(tu - ua_name_ex AS DOUBLE) / CAST(tu AS DOUBLE)))
      |          / ln(2.0) END END)
      |    + (CASE WHEN nat_ag = 1 THEN
      |        CASE WHEN ma_nat_ag > 0 AND ua_nat_ag > 0 THEN
      |          ln(CAST(ma_nat_ag AS DOUBLE) / CAST(tm AS DOUBLE)
      |            / (CAST(ua_nat_ag AS DOUBLE) / CAST(tu AS DOUBLE)))
      |          / ln(2.0) END
      |      ELSE CASE WHEN tm - ma_nat_ag > 0 AND tu - ua_nat_ag > 0 THEN
      |          ln(CAST(tm - ma_nat_ag AS DOUBLE) / CAST(tm AS DOUBLE)
      |            / (CAST(tu - ua_nat_ag AS DOUBLE) / CAST(tu AS DOUBLE)))
      |          / ln(2.0) END END)
      |    + (CASE WHEN seg_ag = 1 THEN
      |        CASE WHEN ma_seg_ag > 0 AND ua_seg_ag > 0 THEN
      |          ln(CAST(ma_seg_ag AS DOUBLE) / CAST(tm AS DOUBLE)
      |            / (CAST(ua_seg_ag AS DOUBLE) / CAST(tu AS DOUBLE)))
      |          / ln(2.0) END
      |      ELSE CASE WHEN tm - ma_seg_ag > 0 AND tu - ua_seg_ag > 0 THEN
      |          ln(CAST(tm - ma_seg_ag AS DOUBLE) / CAST(tm AS DOUBLE)
      |            / (CAST(tu - ua_seg_ag AS DOUBLE) / CAST(tu AS DOUBLE)))
      |          / ln(2.0) END END)
      |    + (CASE WHEN band_ag = 1 THEN
      |        CASE WHEN ma_band_ag > 0 AND ua_band_ag > 0 THEN
      |          ln(CAST(ma_band_ag AS DOUBLE) / CAST(tm AS DOUBLE)
      |            / (CAST(ua_band_ag AS DOUBLE) / CAST(tu AS DOUBLE)))
      |          / ln(2.0) END
      |      ELSE CASE WHEN tm - ma_band_ag > 0 AND tu - ua_band_ag > 0 THEN
      |          ln(CAST(tm - ma_band_ag AS DOUBLE) / CAST(tm AS DOUBLE)
      |            / (CAST(tu - ua_band_ag AS DOUBLE) / CAST(tu AS DOUBLE)))
      |          / ln(2.0) END END), 6) END AS fs_weight
      |FROM mu ORDER BY name_ex, nat_ag, seg_ag, band_ag""".stripMargin)

  /** §2.336 `blocking_eval`: pair completeness vs reduction ratio for
    * two blocking schemes over the same linkage task — the deletion
    * neighborhood (§2.127, lev-1-complete by construction) and a
    * conventional (nation, band) equi-block. Per scheme: candidate
    * pairs, true matches covered, total true matches, completeness,
    * and reduction ratio vs the n² pair space.
    *
    * Scale shape: the deletion scheme's candidates must be counted as
    * DISTINCT pairs (one corpus-sized join → count); the equi-block
    * scheme's candidate count NEVER materializes pairs — it is
    * Σ_blocks |clean_b|·|dirty_b| over the bounded block-stat join
    * (the arithmetic shortcut is the whole point of evaluating a
    * blocker before running it). Covered matches need only the n-row
    * clean⋈dirty-on-id join.
    *
    * Determinism: counts exact BIGINTs; the two ratios are single
    * divisions of integer-valued doubles rounded at 6 dp (n² via
    * double multiply — exact to 2⁵³, i.e. to n ≈ 9.4·10⁷; past that
    * the house DECIMAL(38,0) convention applies and is noted here). */
  def blockingEval(spark: SparkSession, dir: String): DataFrame = {
    val cl = clean(spark, dir)
    val dt = dirty(spark, dir)
    // 1-row stat frame (never a driver action): total true matches =
    // |clean| (every clean row has exactly one dirty twin)
    val nTrue = cl.agg(count(lit(1)).as("n_true"))
    // scheme A: deletion neighborhood — distinct candidate pairs
    val ck = Fuzzy.withDeletionKeys(cl.repartition(), "name")
      .select(col("id"), col("bkey"))
    val dk = Fuzzy.withDeletionKeys(dt.repartition(), "name")
      .select(col("id"), col("bkey"))
    val candA = ck.alias("a")
      .join(dk.hint("shuffle_hash").alias("b"), Seq("bkey"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val aStats = candA.agg(
      count(lit(1)).as("n_cand"),
      sum(when(col("id_a") === col("id_b"), 1L).otherwise(0L))
        .as("n_covered"))
      .select(lit("deletion_nbhd").as("scheme"), col("n_cand"),
        col("n_covered"))
    // scheme B: (nation, band) equi-block — block-stat arithmetic only
    val cb = cl.groupBy("nation", "band").agg(count(lit(1)).as("cc"))
    val db = dt.groupBy("nation", "band").agg(count(lit(1)).as("dc"))
    val nCandB = cb.join(db, Seq("nation", "band"))
      .agg(coalesce(sum(col("cc") * col("dc")), lit(0L)).as("n_cand"))
    val covB = cl.alias("c").join(dt.alias("d"), Seq("id"))
      .agg(sum(when(col("c.nation") === col("d.nation") &&
        col("c.band") === col("d.band"), 1L).otherwise(0L))
        .as("n_covered"))
    val bStats = nCandB.crossJoin(covB) // 1-row × 1-row stat join
      .select(lit("nation_band").as("scheme"), col("n_cand"),
        col("n_covered"))
    def dbl(c: Column): Column = c.cast("double")
    aStats.unionAll(bStats)
      .crossJoin(broadcast(nTrue)) // 1-row stat broadcast
      .withColumn("completeness",
        when(col("n_true") > 0L,
          round(dbl(col("n_covered")) / dbl(col("n_true")), 6)))
      .withColumn("reduction_ratio",
        when(col("n_true") > 0L, round(lit(1.0) -
          dbl(col("n_cand")) / (dbl(col("n_true")) * dbl(col("n_true"))),
          6)))
      .orderBy("scheme")
  }

  val blockingEvalSql: String = withCtes(
    """, a_stats AS (
      |  SELECT 'deletion_nbhd' AS scheme, count(*) AS n_cand,
      |      CAST(sum(CASE WHEN id_a = id_b THEN 1 ELSE 0 END) AS BIGINT)
      |        AS n_covered
      |    FROM (SELECT DISTINCT a.id AS id_a, b.id AS id_b
      |      FROM ckeys a JOIN dkeys b ON a.bkey = b.bkey) p),
      |b_stats AS (
      |  SELECT 'nation_band' AS scheme,
      |      (SELECT COALESCE(CAST(sum(cc * dc) AS BIGINT), 0)
      |        FROM (SELECT nation, band, count(*) AS cc FROM clean
      |          GROUP BY 1, 2) x
      |        JOIN (SELECT nation, band, count(*) AS dc FROM dirty
      |          GROUP BY 1, 2) y USING (nation, band)) AS n_cand,
      |      (SELECT CAST(sum(CASE WHEN c.nation = d.nation
      |            AND c.band = d.band THEN 1 ELSE 0 END) AS BIGINT)
      |        FROM clean c JOIN dirty d USING (id)) AS n_covered),
      |u AS (SELECT * FROM a_stats UNION ALL SELECT * FROM b_stats),
      |t AS (SELECT count(*) AS n_true FROM clean)
      |SELECT scheme, n_cand, n_covered, n_true,
      |  CASE WHEN n_true > 0 THEN round(
      |    CAST(n_covered AS DOUBLE) / CAST(n_true AS DOUBLE), 6) END
      |    AS completeness,
      |  CASE WHEN n_true > 0 THEN round(1.0 - CAST(n_cand AS DOUBLE)
      |    / (CAST(n_true AS DOUBLE) * CAST(n_true AS DOUBLE)), 6) END
      |    AS reduction_ratio
      |FROM u CROSS JOIN t ORDER BY scheme""".stripMargin)
}
