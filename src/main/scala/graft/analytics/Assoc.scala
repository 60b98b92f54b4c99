package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Association / distribution-free test family (round 9) — the
  * rank-and-contingency statistics next to §2.312's Spearman ρ:
  * tie-exact Kendall τ-b, Cramér's V, and the Wald–Wolfowitz runs
  * test. All three collapse the corpus to a bounded frame first
  * (day-grain series or a |types|×7 contingency), so the pairwise /
  * per-cell arithmetic never touches corpus-sized data — the §2.253
  * theil_sen calendar²-bounded shape. */
object Assoc {

  /** §2.321 `kendall_tau`: tie-exact Kendall τ-b between the daily
    * click-revenue and purchase-revenue series — the rank correlation
    * that stays honest under ties where §2.312's ρ needs mid-rank
    * correction (τ counts concordant/discordant PAIRS, so ties are
    * first-class: τ-b = (C−D)/√((n₀−t_x)(n₀−t_y))).
    *
    * Scale shape: one map-side-combined groupBy to the day grain
    * (~|calendar| rows at ANY corpus size), then the pair counts over
    * the bounded frame (broadcast self-join, calendar²-bounded — the
    * theil_sen precedent §2.253).
    *
    * Determinism: C, D, tie terms, n₀ are exact BIGINTs; τ-b is ONE
    * fixed-sequence float expression of those integers with the
    * zero-variance degenerate INTEGER-gated to NULL on both engines. */
  def kendallTau(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(
        sum(when(col("event_type") === "click",
          expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase",
          expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L)).as("y"))
    val a = d.alias("a")
    val b = d.alias("b")
    val pairs = a.join(broadcast(b), col("a.day") < col("b.day"))
      .agg(
        sum(when((col("a.x") - col("b.x")) * (col("a.y") - col("b.y")) > 0,
          1L).otherwise(0L)).as("c"),
        sum(when((col("a.x") - col("b.x")) * (col("a.y") - col("b.y")) < 0,
          1L).otherwise(0L)).as("d"),
        sum(when(col("a.x") === col("b.x"), 1L).otherwise(0L)).as("tx"),
        sum(when(col("a.y") === col("b.y"), 1L).otherwise(0L)).as("ty"))
    val n = d.agg(count(lit(1)).as("n"))
    pairs.crossJoin(broadcast(n))
      .withColumn("n0", expr("n * (n - 1) div 2"))
      .select(col("n").as("n_days"), col("c").as("concordant"),
        col("d").as("discordant"), col("tx").as("ties_x"),
        col("ty").as("ties_y"),
        round(when(col("n0") > col("tx") && col("n0") > col("ty"),
          (col("c") - col("d")).cast("double") /
            sqrt((col("n0") - col("tx")).cast("double") *
              (col("n0") - col("ty")).cast("double"))), 6).as("tau_b"))
  }

  val kendallTauSql: String =
    """WITH d AS (SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
      |    CAST(sum(CASE WHEN event_type = 'click'
      |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN event_type = 'purchase'
      |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
      |  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1),
      |p AS (SELECT
      |    CAST(sum(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c,
      |    CAST(sum(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS d,
      |    CAST(sum(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT) AS tx,
      |    CAST(sum(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT) AS ty
      |  FROM d a JOIN d b ON a.day < b.day),
      |n AS (SELECT count(*) AS n FROM d)
      |SELECT n.n AS n_days, p.c AS concordant, p.d AS discordant,
      |  p.tx AS ties_x, p.ty AS ties_y,
      |  round(CASE WHEN n * (n - 1) // 2 > tx AND n * (n - 1) // 2 > ty
      |    THEN CAST(c - d AS DOUBLE) /
      |      sqrt(CAST(n * (n - 1) // 2 - tx AS DOUBLE) *
      |           CAST(n * (n - 1) // 2 - ty AS DOUBLE)) END, 6) AS tau_b
      |FROM p CROSS JOIN n""".stripMargin

  /** §2.322 `cramers_v`: Cramér's V association between event type and
    * day-of-week over the bounded |types|×7 contingency — "is behavior
    * day-of-week-dependent, and how much", the effect-size companion
    * to a bare χ² (χ² grows with n; V ∈ [0,1] doesn't).
    *
    * Scale shape: one map-side-combined groupBy to ≤ |types|·7 cells;
    * everything after runs on that bounded frame.
    *
    * Determinism: cell/margin counts exact BIGINTs; each χ² addend is
    * (n·o − r·c)²/(n·r·c) — one fixed-sequence float of exact
    * integers — summed by an ORDERED fold over (etype, dow) (the
    * §2.241 fixed-order-addends rule, since cross-row float sums are
    * engine-order-dependent); the r=1/c=1 degenerate INTEGER-gated. */
  def cramersV(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(spark, dir)
      .groupBy(col("event_type"), dayofweek(col("ts")).cast("long").as("dow"))
      .agg(count(lit(1)).as("o"))
    val rows = cells.groupBy("event_type").agg(sum("o").as("r"))
    val cols = cells.groupBy("dow").agg(sum("o").as("c"))
    val tot = cells.agg(sum("o").as("n"),
      countDistinct("event_type").as("nr"), countDistinct("dow").as("nc"))
    cells.join(broadcast(rows), "event_type")
      .join(broadcast(cols), "dow")
      .crossJoin(broadcast(tot))
      .withColumn("term",
        (col("n") * col("o") - col("r") * col("c")).cast("double") *
          (col("n") * col("o") - col("r") * col("c")).cast("double") /
          (col("n").cast("double") * col("r").cast("double") *
            col("c").cast("double")))
      .groupBy("n", "nr", "nc")
      .agg(sort_array(collect_list(struct(col("event_type"), col("dow"),
        col("term")))).as("terms"))
      .select(col("n"), col("nr").as("n_rows"), col("nc").as("n_cols"),
        expr("aggregate(terms, CAST(0 AS DOUBLE), (acc, t) -> acc + t.term)")
          .as("chi2_raw"))
      .select(col("n"), col("n_rows"), col("n_cols"),
        round(col("chi2_raw"), 6).as("chi2"),
        round(when(col("n_rows") > 1 && col("n_cols") > 1,
          sqrt(col("chi2_raw") / (col("n").cast("double") *
            least(col("n_rows") - 1, col("n_cols") - 1).cast("double")))), 6)
          .as("cramers_v"))
  }

  val cramersVSql: String =
    """WITH cells AS (SELECT event_type,
      |    CAST(dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS BIGINT) AS dow,
      |    count(*) AS o
      |  FROM events GROUP BY 1, 2),
      |r AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
      |c AS (SELECT dow, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
      |t AS (SELECT CAST(sum(o) AS BIGINT) AS n,
      |    count(DISTINCT event_type) AS nr, count(DISTINCT dow) AS nc
      |  FROM cells),
      |terms AS (SELECT cells.event_type, cells.dow, t.n, t.nr, t.nc,
      |    CAST(t.n * cells.o - r.r * c.c AS DOUBLE)
      |      * CAST(t.n * cells.o - r.r * c.c AS DOUBLE)
      |      / (CAST(t.n AS DOUBLE) * CAST(r.r AS DOUBLE) * CAST(c.c AS DOUBLE))
      |      AS term
      |  FROM cells JOIN r USING (event_type) JOIN c USING (dow) CROSS JOIN t),
      |agg AS (SELECT n, nr, nc,
      |    list_sum(list(term ORDER BY event_type, dow)) AS chi2_raw
      |  FROM terms GROUP BY 1, 2, 3)
      |SELECT n, nr AS n_rows, nc AS n_cols, round(chi2_raw, 6) AS chi2,
      |  round(CASE WHEN nr > 1 AND nc > 1 THEN
      |    sqrt(chi2_raw / (CAST(n AS DOUBLE)
      |      * CAST(least(nr - 1, nc - 1) AS DOUBLE))) END, 6) AS cramers_v
      |FROM agg""".stripMargin

  /** §2.323 `runs_test`: Wald–Wolfowitz runs test for randomness of
    * the daily-revenue direction — is the sequence of above/below-
    * median days random, or does it trend/oscillate? (The
    * distribution-free sanity check run before fitting §2.248-style
    * trend models.) R runs among n₁ above / n₂ below-or-equal days;
    * z = (R − μ)/σ with μ = 2n₁n₂/(n₁+n₂) + 1 and
    * σ² = 2n₁n₂(2n₁n₂ − n₁ − n₂) / ((n₁+n₂)²(n₁+n₂−1)).
    *
    * Scale shape: corpus → day grain (map-side combine); the median,
    * run count (one lag window), and z all run on the bounded series.
    *
    * Determinism: the median is selected ALL-INTEGER (smallest daily
    * cents with 2·cum ≥ n, §2.272's rule); signs and run breaks are
    * integer; μ/σ/z one fixed-sequence float of exact integers; the
    * one-sided corpus (n₁ or n₂ = 0, or a single day) INTEGER-gated
    * to NULL. */
  def runsTest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
    val wCum = Window.orderBy("cents", "day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = days
      .withColumn("cum", count(lit(1)).over(wCum))
      .crossJoin(broadcast(days.agg(count(lit(1)).as("n"))))
      .filter(col("cum") * 2 >= col("n"))
      .agg(min("cents").as("med"))
    val signed = days.crossJoin(broadcast(med))
      .withColumn("up", when(col("cents") > col("med"), 1L).otherwise(0L))
    val wDay = Window.orderBy("day")
    val agg = signed
      .withColumn("brk",
        when(lag(col("up"), 1).over(wDay).isNull ||
          lag(col("up"), 1).over(wDay) =!= col("up"), 1L).otherwise(0L))
      .agg(count(lit(1)).as("n_days"), sum("up").as("n1"),
        (count(lit(1)) - sum("up")).as("n2"), sum("brk").as("runs"))
    def d(c: String) = col(c).cast("double")
    val mu = lit(2.0) * d("n1") * d("n2") / (d("n1") + d("n2")) + lit(1.0)
    val sig2 = (lit(2.0) * d("n1") * d("n2") *
      (lit(2.0) * d("n1") * d("n2") - d("n1") - d("n2"))) /
      ((d("n1") + d("n2")) * (d("n1") + d("n2")) *
        (d("n1") + d("n2") - lit(1.0)))
    agg.select(col("n_days"), col("n1"), col("n2"), col("runs"),
      round(when(col("n1") > 0 && col("n2") > 0 && col("n_days") > 1, mu), 6)
        .as("mu"),
      // 2n₁n₂ = n₁+n₂ (i.e. n₁=n₂=1) zeroes σ — integer-gated
      round(when(col("n1") > 0 && col("n2") > 0 &&
        lit(2L) * col("n1") * col("n2") - col("n1") - col("n2") > 0,
        (col("runs").cast("double") - mu) / sqrt(sig2)), 6).as("z"))
  }

  /** §2.328 `mann_kendall`: Mann–Kendall monotone-trend test on the
    * daily-revenue series — S = Σ_{i<j} sign(x_j − x_i) over the
    * time-ordered days, tie-corrected Var(S) = (n(n−1)(2n+5) −
    * Σ_t t(t−1)(2t+5))/18, continuity-corrected z. Completes the
    * §2.321/323 triptych: runs_test asks "random?", kendall_tau asks
    * "associated with the other series?", this asks "trending?" —
    * the standard pre-model trend detector (Mann 1945, Kendall 1975).
    *
    * Scale shape: corpus → day grain map-side; the pairwise count and
    * the tie groups both live on calendar-bounded frames (§2.253).
    *
    * Determinism: S and both variance numerators exact BIGINTs;
    * z = (S∓1)/√(num/18) ONE fixed-sequence float, the all-tied
    * num=0 degenerate INTEGER-gated to NULL; z=0 exactly at S=0. */
  def mannKendall(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
    val a = days.alias("a")
    val b = days.alias("b")
    val s = a.join(broadcast(b), col("a.day") < col("b.day"))
      .agg(sum(signum(col("b.cents") - col("a.cents")).cast("long")).as("s"))
    val ties = days.groupBy("cents").agg(count(lit(1)).as("t"))
      .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie_term"))
    val n = days.agg(count(lit(1)).as("n"))
    s.crossJoin(broadcast(n)).crossJoin(broadcast(ties))
      .withColumn("var_num",
        expr("n * (n - 1) * (2 * n + 5) - tie_term"))
      .select(col("n").as("n_days"), col("s"), col("var_num"),
        round(when(col("var_num") > 0,
          when(col("s") > 0, (col("s") - 1).cast("double"))
            .when(col("s") < 0, (col("s") + 1).cast("double"))
            .otherwise(lit(0.0)) /
            sqrt(col("var_num").cast("double") / 18.0)), 6).as("z"))
  }

  val mannKendallSql: String =
    """WITH days AS (SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1),
      |s AS (SELECT CAST(sum(CASE WHEN b.cents > a.cents THEN 1
      |    WHEN b.cents < a.cents THEN -1 ELSE 0 END) AS BIGINT) AS s
      |  FROM days a JOIN days b ON a.day < b.day),
      |ties AS (SELECT CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT)
      |    AS tie_term
      |  FROM (SELECT count(*) AS t FROM days GROUP BY cents) g),
      |n AS (SELECT count(*) AS n FROM days)
      |SELECT n.n AS n_days, s.s,
      |  CAST(n * (n - 1) * (2 * n + 5) - tie_term AS BIGINT) AS var_num,
      |  round(CASE WHEN n * (n - 1) * (2 * n + 5) - tie_term > 0 THEN
      |    (CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE)
      |          WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) ELSE 0.0 END) /
      |    sqrt(CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE) / 18.0)
      |    END, 6) AS z
      |FROM s CROSS JOIN n CROSS JOIN ties""".stripMargin

  val runsTestSql: String =
    """WITH days AS (SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1),
      |ranked AS (SELECT cents,
      |    count(*) OVER (ORDER BY cents, day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    count(*) OVER () AS n
      |  FROM days),
      |med AS (SELECT min(cents) AS med FROM ranked WHERE cum * 2 >= n),
      |signed AS (SELECT day,
      |    CASE WHEN cents > med THEN 1 ELSE 0 END AS up
      |  FROM days CROSS JOIN med),
      |brk AS (SELECT up, CASE WHEN lag(up) OVER (ORDER BY day) IS DISTINCT
      |    FROM up THEN 1 ELSE 0 END AS brk FROM signed),
      |agg AS (SELECT count(*) AS n_days, CAST(sum(up) AS BIGINT) AS n1,
      |    CAST(count(*) - sum(up) AS BIGINT) AS n2,
      |    CAST(sum(brk) AS BIGINT) AS runs FROM brk)
      |SELECT n_days, n1, n2, runs,
      |  round(CASE WHEN n1 > 0 AND n2 > 0 AND n_days > 1 THEN
      |    2.0 * n1 * n2 / (n1 + n2) + 1.0 END, 6) AS mu,
      |  round(CASE WHEN n1 > 0 AND n2 > 0 AND 2 * n1 * n2 - n1 - n2 > 0 THEN
      |    (CAST(runs AS DOUBLE) - (2.0 * n1 * n2 / (n1 + n2) + 1.0)) /
      |    sqrt((2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)) /
      |      (CAST(n1 + n2 AS DOUBLE) * (n1 + n2) * (n1 + n2 - 1.0)))
      |    END, 6) AS z
      |FROM agg""".stripMargin
}
