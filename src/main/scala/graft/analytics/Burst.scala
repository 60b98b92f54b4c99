package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.native.viterbi_burst

/** Kleinberg burst detection — SURVEY.md §2.350.
  *
  * The change detectors so far flag a POINT (§2.213 CUSUM, §2.258
  * Page–Hinkley) or score residuals (§2.238); Kleinberg's 2-state
  * automaton (KDD 2002 — the canonical "bursty structure" model)
  * instead segments the whole series into base/burst INTERVALS: state
  * 1 emits at [[BurstFactor]]× the base rate, entering it costs
  * γ·ln T, and the min-cost state path is exact Viterbi — the
  * standard trends/incident-window detector over event streams.
  *
  * Determinism: Poisson state costs reduce (after dropping the
  * state-independent ln c! term — constant across states, so it can
  * never change an argmin) to λ_q − c·ln λ_q with λ_q = a_q/T for
  * INTEGER a_q; each day's cost is assembled from pre-rounded integer
  * nano-units — HALFUP(a_q·10⁹/T) − c·round(10⁹·ln a_q) +
  * c·round(10⁹·ln T) — so ln only ever sees identical INTEGER
  * arguments (the §2.342 convention) and the whole DP is exact Long.
  * Tie-breaks prefer state 0/staying, mirrored in both engines.
  *
  * Engine: ONE compiled Viterbi kernel per type
  * ([[graft.functions.ViterbiBurst]]; the data-dependent transition
  * cost rides as element 0 of the state-1 cost array). Oracle: the
  * identical recurrence as a linear recursive CTE carrying
  * (v0, v1, path0, path1) per type — paths ride as lists, the §2.349
  * wavefront idiom collapsed to chain form.
  *
  * Scale shape: ONE map-side (type, day) groupBy touches the corpus;
  * the dense calendar spine, cost arrays, kernel, and the
  * state-sequence → interval aggregation (posexplode of a
  * calendar-bounded array + partitioned windows) are all bounded. */
object Burst {

  /** Burst-state rate multiplier (Kleinberg's s). */
  val BurstFactor = 2L

  /** §2.350 `burst_detect`: per event type — burst-day count, number
    * of burst intervals, longest interval, first/last burst day, and
    * the share of events inside bursts. */
  def burstDetect(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val daily = e.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    val bounds = e.agg(min(to_date(col("ts"))).as("mind"),
      max(to_date(col("ts"))).as("maxd"))
    val spine = bounds.select(explode(expr("sequence(mind, maxd)")).as("day"))
      .withColumn("t_days", count(lit(1)).over(Window.partitionBy(lit(1))))
    val types = daily.groupBy("event_type").agg(sum("c").as("n_tot"))
    val dense = types.crossJoin(broadcast(spine))
      .join(daily, Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("c"))
    // integer nano-unit Poisson costs; ln sees INTEGER args only
    def li(x: String) = s"CAST(round(1e9 * ln(CAST($x AS DOUBLE))) AS BIGINT)"
    // the λ term multiplies n_tot by 2e9 BEFORE the divide — in BIGINT
    // that wraps silently (Spark, non-ANSI) or errors (DuckDB) once a
    // type's event count reaches ~4.6e9, well inside 100 TB scale; the
    // product runs in DECIMAL(38,0)/HUGEINT and only the ≤n_tot·1e9/
    // t_days-sized QUOTIENT returns to BIGINT
    val costs = dense
      .withColumn("cost0", expr(
        s"(2 * CAST(n_tot AS DECIMAL(28,0)) * 1000000000 + t_days) div (2 * t_days)" +
          s" - c * ${li("n_tot")} + c * ${li("t_days")}"))
      .withColumn("cost1", expr(
        s"(2 * $BurstFactor * CAST(n_tot AS DECIMAL(28,0)) * 1000000000 + t_days) div (2 * t_days)" +
          s" - c * ${li(s"$BurstFactor * n_tot")} + c * ${li("t_days")}"))
    val arrs = costs.groupBy("event_type")
      .agg(max("t_days").as("t_days"), max("n_tot").as("n_tot"),
        transform(array_sort(collect_list(struct(col("day"), col("cost0")))),
          x => x.getField("cost0")).as("c0s"),
        transform(array_sort(collect_list(struct(col("day"), col("cost1")))),
          x => x.getField("cost1")).as("c1s"),
        transform(array_sort(collect_list(struct(col("day"), col("c")))),
          x => x.getField("c")).as("cs"),
        array_sort(collect_list(col("day"))).as("days"))
      // transition cost γ·ln T (γ = 1), prepended to the state-1 array
      .withColumn("states", viterbi_burst(col("c0s"),
        concat(array(expr(li("t_days"))), col("c1s"))))
    // states → per-day frame (calendar-bounded) → interval stats
    val perDay = arrs.select(col("event_type"), col("n_tot"),
        posexplode(arrays_zip(col("days"), col("cs"), col("states"))))
      .select(col("event_type"), col("n_tot"),
        col("col.days").as("day"), col("col.cs").as("c"),
        col("col.states").as("st"))
    val wd = Window.partitionBy("event_type").orderBy("day")
    val runs = perDay
      .withColumn("brk",
        when(col("st") === 1 && coalesce(lag("st", 1).over(wd), lit(0)) =!= 1,
          1L).otherwise(0L))
      .withColumn("run_id", sum("brk").over(
        wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runLens = runs.filter(col("st") === 1)
      .groupBy("event_type", "run_id").agg(count(lit(1)).as("len"))
      .groupBy(col("event_type").as("et2"))
      .agg(max("len").as("longest_burst"))
    runs.groupBy("event_type")
      .agg(max("n_tot").as("n_events"),
        sum("st").as("burst_days"),
        sum("brk").as("n_bursts"),
        min(when(col("st") === 1, col("day"))).as("first_burst_day"),
        max(when(col("st") === 1, col("day"))).as("last_burst_day"),
        sum(when(col("st") === 1, col("c")).otherwise(0L)).as("burst_events"))
      .join(runLens, col("event_type") === col("et2"), "left")
      .select(col("event_type"), col("n_events"), col("burst_days"),
        col("n_bursts"), coalesce(col("longest_burst"), lit(0L))
          .as("longest_burst"),
        col("first_burst_day"), col("last_burst_day"),
        round(col("burst_events").cast("double") / col("n_events"), 6)
          .as("burst_event_share"))
      .orderBy("event_type")
  }

  val burstDetectSql: String = {
    def li(x: String) = s"CAST(round(1e9 * ln(CAST($x AS DOUBLE))) AS BIGINT)"
    s"""WITH RECURSIVE bounds AS (SELECT min(CAST(ts AS DATE)) AS mind,
       |    max(CAST(ts AS DATE)) AS maxd FROM events),
       |spine AS (SELECT CAST(unnest(generate_series(mind, maxd,
       |    INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
       |sp AS (SELECT day, count(*) OVER () AS t_days FROM spine),
       |daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
       |    count(*) AS c FROM events GROUP BY 1, 2),
       |types AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n_tot
       |  FROM daily GROUP BY 1),
       |dense AS (SELECT t.event_type, t.n_tot, s.day, s.t_days,
       |    COALESCE(d.c, 0) AS c
       |  FROM types t CROSS JOIN sp s
       |  LEFT JOIN daily d ON d.event_type = t.event_type
       |    AND d.day = s.day),
       |costs AS (SELECT event_type, n_tot, day, t_days, c,
       |    CAST((2 * CAST(n_tot AS HUGEINT) * 1000000000 + t_days)
       |      // (2 * t_days) AS BIGINT)
       |      - c * ${li("n_tot")} + c * ${li("t_days")} AS cost0,
       |    CAST((2 * $BurstFactor * CAST(n_tot AS HUGEINT) * 1000000000
       |      + t_days) // (2 * t_days) AS BIGINT)
       |      - c * ${li(s"$BurstFactor * n_tot")}
       |      + c * ${li("t_days")} AS cost1
       |  FROM dense),
       |arrs AS (SELECT event_type, max(n_tot) AS n_tot,
       |    max(t_days) AS t_days,
       |    list(cost0 ORDER BY day) AS c0s,
       |    list(cost1 ORDER BY day) AS c1s,
       |    list(c ORDER BY day) AS cs,
       |    list(day ORDER BY day) AS days
       |  FROM costs GROUP BY event_type),
       |vit AS (
       |  SELECT event_type, n_tot, t_days, c0s, c1s, cs, days, 1 AS i,
       |    c0s[1] AS v0, c1s[1] + ${li("t_days")} AS v1,
       |    [0] AS p0, [1] AS p1
       |  FROM arrs
       |  UNION ALL
       |  SELECT event_type, n_tot, t_days, c0s, c1s, cs, days, i + 1,
       |    c0s[i + 1] + least(v0, v1),
       |    c1s[i + 1] + least(v1, v0 + ${li("t_days")}),
       |    list_append(CASE WHEN v0 <= v1 THEN p0 ELSE p1 END, 0),
       |    list_append(CASE WHEN v1 <= v0 + ${li("t_days")}
       |      THEN p1 ELSE p0 END, 1)
       |  FROM vit WHERE i < len(c0s)),
       |path AS (SELECT event_type, n_tot, cs, days,
       |    CASE WHEN v0 <= v1 THEN p0 ELSE p1 END AS st
       |  FROM vit WHERE i = len(c0s)),
       |perday AS (SELECT event_type, n_tot,
       |    days[u.i] AS day, cs[u.i] AS c, st[u.i] AS s
       |  FROM path, unnest(generate_series(1, len(st))) AS u(i)),
       |runs AS (SELECT *, CASE WHEN s = 1 AND COALESCE(lag(s) OVER (
       |      PARTITION BY event_type ORDER BY day), 0) != 1
       |    THEN 1 ELSE 0 END AS brk
       |  FROM perday),
       |runid AS (SELECT *, sum(brk) OVER (PARTITION BY event_type
       |    ORDER BY day ROWS UNBOUNDED PRECEDING) AS run_id FROM runs),
       |runlen AS (SELECT event_type, max(len) AS longest_burst FROM (
       |    SELECT event_type, run_id, count(*) AS len FROM runid
       |    WHERE s = 1 GROUP BY 1, 2) q GROUP BY 1)
       |SELECT r.event_type, CAST(max(n_tot) AS BIGINT) AS n_events,
       |  CAST(sum(s) AS BIGINT) AS burst_days,
       |  CAST(sum(brk) AS BIGINT) AS n_bursts,
       |  COALESCE(CAST(max(longest_burst) AS BIGINT), 0)
       |    AS longest_burst,
       |  min(CASE WHEN s = 1 THEN day END) AS first_burst_day,
       |  max(CASE WHEN s = 1 THEN day END) AS last_burst_day,
       |  round(CAST(sum(CASE WHEN s = 1 THEN c ELSE 0 END) AS DOUBLE)
       |    / max(n_tot), 6) AS burst_event_share
       |FROM runid r LEFT JOIN runlen rl ON r.event_type = rl.event_type
       |GROUP BY r.event_type ORDER BY r.event_type""".stripMargin
  }
}
