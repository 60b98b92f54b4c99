package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.native.dtw_band_distance

/** Banded dynamic-time-warping series distance — SURVEY.md §2.349.
  *
  * The series family measures association at FIXED alignment (§2.246
  * xcorr scans integer lags, §2.247 rolling corr, §2.321 τ) — but two
  * metrics that trace the same shape a few days apart and locally
  * stretched need elastic alignment, and DTW (Sakoe & Chiba 1978) is
  * the standard elastic distance: the cheapest monotone warping path
  * through the |a_i − b_j| cost lattice. The Sakoe–Chiba band (|i−j| ≤
  * [[Band]]) is both the classic regularizer (unconstrained warping
  * degenerates) and the cost bound: O(T·band) per pair, not O(T²).
  *
  * Engine side: ONE compiled two-row DP kernel per pair
  * ([[graft.functions.DtwBandDistance]] — §2.334's no-interpreted-
  * lambda rule; band = 0 reuses the same kernel as the plain aligned
  * L1 baseline, so the reported `stretch` = dtw/l1 ≤ 1 is an output
  * invariant). Oracle side: the IDENTICAL recurrence as a recursive
  * CTE over anti-diagonal WAVEFRONTS — cell (i,j) needs (i−1,j) and
  * (i,j−1) from wavefront k−1 and (i−1,j−1) from k−2, so each
  * recursion step carries two wavefront LISTS per pair and computes
  * the next with one list_transform (the §2.90 list-fold idiom,
  * vectorized per step: 2T−2 steps, never T² rows).
  *
  * Determinism: series are EXACT integer cents (per-event
  * integerization before the sum — never a float sum), mean-centered
  * by a HALF-UP integer mean (values are non-negative pre-centering,
  * so truncating and flooring div agree); every DP cell is a pure
  * Long; out-of-band = 2⁶⁰ on both engines; the only float is the
  * final gated stretch division.
  *
  * Scale shape: the corpus collapses in ONE map-side groupBy to
  * (type, day); the dense last-[[T]] spine, centering, list assembly,
  * pair join (|types|² ≤ 25 rows) and the DP all run on bounded
  * frames. At 100 TB this is one scan + calendar-bounded arithmetic;
  * with 10⁶ series (per-item grain) the same plan holds — n·T cells
  * and n²-bounded-by-blocking pairs, the §2.130 pairing treatment. */
object Dtw {

  /** Dense window length (days, ending at the corpus max day). */
  val T = 60
  /** Sakoe–Chiba band half-width (a week of elastic shift). */
  val Band = 7
  private val Inf = 1L << 60

  /** §2.349 `dtw_distance`: per event-type pair — banded DTW cost,
    * the aligned L1 baseline, and their ratio. */
  def dtwDistance(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val daily = e.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("v"))
    val maxd = e.agg(max(to_date(col("ts"))).as("maxd"))
    val spine = maxd.select(explode(expr(
      s"sequence(date_sub(maxd, ${T - 1}), maxd)")).as("day"))
    val types = daily.select("event_type").distinct()
    val dense = types.crossJoin(broadcast(spine)) // |types|·T rows
      .join(daily, Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("v"))
    val centered = dense
      .withColumn("m", expr(
        "(2 * sum(v) OVER (PARTITION BY event_type) + count(*) OVER " +
          "(PARTITION BY event_type)) div (2 * count(*) OVER " +
          "(PARTITION BY event_type))"))
      .withColumn("vc", col("v") - col("m"))
    val series = centered.groupBy("event_type")
      .agg(transform(array_sort(collect_list(struct(col("day"),
        col("vc")))), x => x.getField("vc")).as("s"))
    // broadcast the (|types|-row) right side EXPLICITLY: both sides are
    // bounded aggregates, but left unpinned AQE replans the non-equi
    // join as a CartesianProduct at sf1 stats (the executed-plan gate's
    // first catch) — the broadcast pin keeps it a bounded-build BNLJ
    // under every statistics regime
    val pairs = series.toDF("et_a", "sa")
      .join(broadcast(series.toDF("et_b", "sb")), col("et_a") < col("et_b"))
    pairs
      .withColumn("dtw", dtw_band_distance(col("sa"), col("sb"), Band))
      .withColumn("l1_diag", dtw_band_distance(col("sa"), col("sb"), 0))
      .select(col("et_a"), col("et_b"), lit(T).as("t_days"),
        col("dtw"), col("l1_diag"),
        when(col("l1_diag") > 0,
          round(col("dtw").cast("double") / col("l1_diag"), 6))
          .otherwise(lit(null).cast("double")).as("stretch"))
      .orderBy("et_a", "et_b")
  }

  val dtwDistanceSql: String = {
    // one wavefront step: from (k, w1 = wavefront k, w0 = k−1) to k+1;
    // position of cell i in wavefront k's list is i − greatest(1, k−T) + 1
    def dpSql(band: Int, cte: String): String =
      s"""$cte AS (
         |  SELECT et_a, et_b, sa, sb, len(sa) AS t, 2 AS k,
         |    [abs(sa[1] - sb[1])] AS w1, CAST([] AS BIGINT[]) AS w0
         |  FROM p
         |  UNION ALL
         |  SELECT et_a, et_b, sa, sb, t, k + 1,
         |    list_transform(generate_series(greatest(1, k + 1 - t),
         |        least(t, k)), i ->
         |      CASE WHEN abs(2 * i - (k + 1)) > $band THEN $Inf
         |      ELSE CASE WHEN least(
         |          CASE WHEN i - 1 - greatest(1, k - t) + 1 BETWEEN 1
         |                AND len(w1)
         |            THEN w1[i - 1 - greatest(1, k - t) + 1]
         |            ELSE $Inf END,
         |          CASE WHEN i - greatest(1, k - t) + 1 BETWEEN 1
         |                AND len(w1)
         |            THEN w1[i - greatest(1, k - t) + 1] ELSE $Inf END,
         |          CASE WHEN i - 1 - greatest(1, k - 1 - t) + 1 BETWEEN 1
         |                AND len(w0)
         |            THEN w0[i - 1 - greatest(1, k - 1 - t) + 1]
         |            ELSE $Inf END) >= $Inf THEN $Inf
         |        ELSE abs(sa[i] - sb[k + 1 - i]) + least(
         |          CASE WHEN i - 1 - greatest(1, k - t) + 1 BETWEEN 1
         |                AND len(w1)
         |            THEN w1[i - 1 - greatest(1, k - t) + 1]
         |            ELSE $Inf END,
         |          CASE WHEN i - greatest(1, k - t) + 1 BETWEEN 1
         |                AND len(w1)
         |            THEN w1[i - greatest(1, k - t) + 1] ELSE $Inf END,
         |          CASE WHEN i - 1 - greatest(1, k - 1 - t) + 1 BETWEEN 1
         |                AND len(w0)
         |            THEN w0[i - 1 - greatest(1, k - 1 - t) + 1]
         |            ELSE $Inf END) END END) AS w1,
         |    w1 AS w0
         |  FROM $cte WHERE k < 2 * t)""".stripMargin
    s"""WITH RECURSIVE md AS (SELECT max(CAST(ts AS DATE)) AS maxd
       |  FROM events),
       |spine AS (SELECT CAST(unnest(generate_series(
       |    maxd - INTERVAL ${T - 1} DAY, maxd, INTERVAL 1 DAY)) AS DATE)
       |    AS day FROM md),
       |daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
       |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
       |  FROM events GROUP BY 1, 2),
       |types AS (SELECT DISTINCT event_type FROM daily),
       |dense AS (SELECT t.event_type, s.day, COALESCE(d.v, 0) AS v
       |  FROM types t CROSS JOIN spine s
       |  LEFT JOIN daily d ON d.event_type = t.event_type
       |    AND d.day = s.day),
       |cen AS (SELECT event_type, day, v -
       |    (2 * sum(v) OVER (PARTITION BY event_type)
       |     + count(*) OVER (PARTITION BY event_type))
       |    // (2 * count(*) OVER (PARTITION BY event_type)) AS vc
       |  FROM dense),
       |series AS (SELECT event_type, list(vc ORDER BY day) AS s
       |  FROM cen GROUP BY event_type),
       |p AS (SELECT a.event_type AS et_a, b.event_type AS et_b,
       |    a.s AS sa, b.s AS sb
       |  FROM series a JOIN series b ON a.event_type < b.event_type),
       |${dpSql(Band, "dpb")},
       |${dpSql(0, "dp0")},
       |res AS (SELECT b.et_a, b.et_b, b.t, b.w1[1] AS dtw,
       |    z.w1[1] AS l1_diag
       |  FROM dpb b JOIN dp0 z ON b.et_a = z.et_a AND b.et_b = z.et_b
       |    AND z.k = 2 * z.t
       |  WHERE b.k = 2 * b.t)
       |SELECT et_a, et_b, CAST($T AS INTEGER) AS t_days,
       |  CAST(dtw AS BIGINT) AS dtw, CAST(l1_diag AS BIGINT) AS l1_diag,
       |  CASE WHEN l1_diag > 0
       |    THEN round(CAST(dtw AS DOUBLE) / l1_diag, 6)
       |    ELSE NULL END AS stretch
       |FROM res ORDER BY et_a, et_b""".stripMargin
  }
}
