package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Shapley-value channel attribution — SURVEY.md §2.343.
  *
  * The attribution ladder so far: positional rules (§2.149), time
  * decay (§2.264), and the Markov removal-effect solve (§2.234).
  * The fourth industry-standard model is game-theoretic: treat each
  * marketing channel as a player, a user journey's conversion as the
  * payoff, and split credit by the Shapley value (Shapley 1953;
  * popularized for ad attribution by Google Analytics' data-driven
  * attribution). Unlike last-touch it credits assist channels; unlike
  * linear it weights a channel by its MARGINAL contribution across
  * all orderings, which is the unique allocation satisfying
  * efficiency/symmetry/dummy/additivity.
  *
  * Characteristic function: v(S) = conversions among journeys whose
  * pre-purchase channel set ⊆ S — the standard "coalition coverage"
  * game on observed journeys (a journey converts under coalition S iff
  * every channel it actually used is present). With n = 4 channels the
  * subset lattice has 16 nodes, so the EXACT value is a bounded
  * computation — no sampling, no permutation Monte Carlo.
  *
  * Determinism: everything is integer until the final display
  * division. 24·φ_i = Σ_{S ∌ i} w(|S|)·(v(S∪{i}) − v(S)) with
  * w(s) = s!·(3−s)! ∈ {6,2,2,6} — exact BIGINT sums over a 32-row
  * grid; φ is reported as one division by 24. Efficiency is auditable
  * in the output: Σ_channels phi_x24 = 24·(v(full) − v(∅)).
  *
  * Scale shape: TWO passes over events (purchase scan for the
  * first-purchase frame, non-purchase scan for journey masks), both
  * collapsing to per-user grain via map-side-combined aggregates; the
  * journey frame collapses again to ≤16 (mask, conv, n) cells, and
  * ALL Shapley arithmetic runs on broadcast-bounded ≤32-row grids.
  * The per-user window is partitioned (never global); at 100 TB the
  * only corpus-sized exchange is the user_id hash partitioning the
  * two scans share. Journeys cut at the FIRST purchase in
  * (ts, event_id) order — §2.234's convention — so the degenerate
  * 1-user corpus (purchase last) yields mask 15, conv 1.
  */
object Shapley {

  /** Channel → bit, alphabetical so both engines agree by construction. */
  val Channels: Seq[(String, Int)] =
    Seq("click" -> 1, "error" -> 2, "signup" -> 4, "view" -> 8)

  /** §2.343 `shapley_attribution`: exact Shapley credit per channel
    * over the coalition-coverage conversion game, with per-channel
    * touch/conversion tallies. */
  def shapleyAttribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
    val fp = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
    val users = e.select("user_id").distinct()
    // pre-purchase channel mask per user (strictly before the first
    // purchase in (ts, event_id) order; non-converters keep everything)
    val pre = e.filter(col("event_type") =!= "purchase")
      .join(fp, Seq("user_id"), "left")
      .filter(col("p_ts").isNull || col("ts") < col("p_ts") ||
        (col("ts") === col("p_ts") && col("event_id") < col("p_id")))
      .select(col("user_id"), expr(
        """CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
          |WHEN 'signup' THEN 4 WHEN 'view' THEN 8 ELSE 0 END"""
          .stripMargin.replace('\n', ' ')).as("bit"))
      .groupBy("user_id").agg(expr("bit_or(bit)").as("mask"))
    val journeys = users
      .join(fp.select(col("user_id"), lit(1L).as("c")), Seq("user_id"), "left")
      .join(pre, Seq("user_id"), "left")
      .select(coalesce(col("c"), lit(0L)).as("conv"),
        coalesce(col("mask"), lit(0)).as("mask"))
    // ≤16 cells: conversions and journey counts per exact channel set
    val cells = journeys.groupBy("mask")
      .agg(sum("conv").as("conv"), count(lit(1)).as("n"))
    // v(S) = Σ conv over cells with mask ⊆ S  (mask & S = mask);
    // both sides bounded (16 subsets × ≤16 aggregate cells)
    val subsets = spark.range(16).select(col("id").cast("int").as("s"))
    val v = subsets.join(broadcast(cells),
        (col("s").bitwiseAND(col("mask"))) === col("mask"), "left")
      .groupBy("s").agg(coalesce(sum("conv"), lit(0L)).as("v"))
    val chan = Channels.toDF("channel", "bit")
    // 4 channels × the 8 subsets not containing each: 32 grid rows
    val grid = chan.join(subsets,
        (col("s").bitwiseAND(col("bit"))) === 0)
      .withColumn("w", expr(
        """CASE (s & 1) + ((s >> 1) & 1) + ((s >> 2) & 1) + ((s >> 3) & 1)
          |WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END"""
          .stripMargin.replace('\n', ' ')).cast("long").as("w"))
    val phi = grid
      .join(broadcast(v).withColumnRenamed("v", "v0"), Seq("s"))
      .join(broadcast(v.select(col("s").as("s1"), col("v").as("v1"))),
        col("s1") === col("s") + col("bit"))
      .groupBy("channel", "bit")
      .agg(sum(col("w") * (col("v1") - col("v0"))).as("phi_x24"))
    // per-channel journey tallies from the bounded cell frame
    val touch = chan.join(broadcast(cells),
        (col("mask").bitwiseAND(col("bit"))) =!= 0, "left")
      .groupBy(col("channel").as("ch"))
      .agg(coalesce(sum("n"), lit(0L)).as("users_touched"),
        coalesce(sum("conv"), lit(0L)).as("conv_present"))
    phi.join(touch, col("channel") === col("ch"))
      .select(col("channel"), col("users_touched"), col("conv_present"),
        col("phi_x24"),
        round(col("phi_x24").cast("double") / 24.0, 6).as("shapley"))
      .orderBy("channel")
  }

  val shapleyAttributionSql: String =
    """WITH fp AS (SELECT user_id, ts AS p_ts, event_id AS p_id FROM (
      |    SELECT user_id, ts, event_id, row_number() OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |    FROM events WHERE event_type = 'purchase') q WHERE rn = 1),
      |users AS (SELECT DISTINCT user_id FROM events),
      |pre AS (SELECT e.user_id, bit_or(CASE e.event_type
      |      WHEN 'click' THEN 1 WHEN 'error' THEN 2
      |      WHEN 'signup' THEN 4 WHEN 'view' THEN 8 ELSE 0 END) AS mask
      |  FROM events e LEFT JOIN fp ON e.user_id = fp.user_id
      |  WHERE e.event_type != 'purchase'
      |    AND (fp.user_id IS NULL OR e.ts < fp.p_ts
      |         OR (e.ts = fp.p_ts AND e.event_id < fp.p_id))
      |  GROUP BY e.user_id),
      |j AS (SELECT CASE WHEN fp.user_id IS NULL THEN 0 ELSE 1 END AS conv,
      |    COALESCE(pre.mask, 0) AS mask
      |  FROM users u LEFT JOIN fp ON u.user_id = fp.user_id
      |  LEFT JOIN pre ON u.user_id = pre.user_id),
      |cells AS (SELECT mask, CAST(sum(conv) AS BIGINT) AS conv,
      |    count(*) AS n FROM j GROUP BY mask),
      |sub AS (SELECT CAST(range AS INTEGER) AS s FROM range(16)),
      |v AS (SELECT s, COALESCE(CAST(sum(c.conv) AS BIGINT), 0) AS v
      |  FROM sub LEFT JOIN cells c ON (c.mask & sub.s) = c.mask
      |  GROUP BY s),
      |chan AS (SELECT * FROM (VALUES ('click', 1), ('error', 2),
      |    ('signup', 4), ('view', 8)) AS t(channel, bit)),
      |grid AS (SELECT chan.channel AS channel, bit, s,
      |    CAST(CASE (s & 1) + ((s >> 1) & 1) + ((s >> 2) & 1) + ((s >> 3) & 1)
      |      WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END AS BIGINT) AS w
      |  FROM chan JOIN sub ON (s & bit) = 0),
      |phi AS (SELECT channel, bit,
      |    CAST(sum(w * (v1.v - v0.v)) AS BIGINT) AS phi_x24
      |  FROM grid JOIN v v0 ON v0.s = grid.s
      |  JOIN v v1 ON v1.s = grid.s + grid.bit
      |  GROUP BY channel, bit),
      |touch AS (SELECT channel,
      |    COALESCE(CAST(sum(c.n) AS BIGINT), 0) AS users_touched,
      |    COALESCE(CAST(sum(c.conv) AS BIGINT), 0) AS conv_present
      |  FROM chan LEFT JOIN cells c ON (c.mask & chan.bit) != 0
      |  GROUP BY channel)
      |SELECT p.channel, t.users_touched, t.conv_present, p.phi_x24,
      |  round(CAST(p.phi_x24 AS DOUBLE) / 24.0, 6) AS shapley
      |FROM phi p JOIN touch t ON p.channel = t.channel
      |ORDER BY 1""".stripMargin
}
