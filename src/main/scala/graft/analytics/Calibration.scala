package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Isotonic (PAV) score calibration — SURVEY.md §2.344.
  *
  * §2.225's ECE *measures* miscalibration; this op *fixes* it: the
  * isotonic-regression calibration map (Zadrozny & Elkan 2002 —
  * the standard non-parametric alternative to Platt scaling, and what
  * sklearn's CalibratedClassifierCV(method="isotonic") fits). The
  * map is the monotone step function closest in weighted L2 to the
  * per-bin positive rates — computed here via the MINIMAX closed form
  * iso(i) = max_{j≤i} min_{k≥i} rate(j..k) (Robertson, Wright & Dykstra
  * 1988), which needs no sequential pool-adjacent-violators loop and
  * is therefore expressible as bounded joins in BOTH engines.
  *
  * Scale shape: ONE map-side-combined groupBy collapses the corpus to
  * ≤ [[IsoBins]] (bin, n, n_pos) cells; every minimax step runs on the
  * ≤ B³ = 8000-row grid built from that bounded aggregate (broadcast
  * joins, windows over aggregates only — the §2.334 allowances). The
  * corpus is touched exactly once.
  *
  * Determinism: interval rates are HALF-UP integer MICRO-units
  * ((2·pos·10⁶ + n) div (2·n) — exact BIGINTs; bounds the corpus at
  * ~4.6×10¹² docs, fine past 100 TB of text), so min/max run on
  * identical integers in both engines and the only float ops are the
  * final display divisions. n ≥ 1 per occupied bin by construction —
  * no zero denominators anywhere (the §2.326 1-doc corpus yields one
  * bin with j = k = i). */
object Calibration {

  /** Score-grid bins for the calibration map (deciles are the ECE
    * convention; 20 gives the map finer steps at the same bounded
    * cost). */
  val IsoBins = 20

  /** §2.344 `isotonic_calibration`: per occupied score bin — count,
    * positives, raw positive rate, isotonic (PAV) calibrated rate —
    * plus the corpus-level mean absolute adjustment the fit applies.
    * Score/label frame identical to §2.225 (quality score as an
    * English-document classifier). */
  def isotonicCalibration(spark: SparkSession, dir: String): DataFrame = {
    val f = graft.text.TextQueries.qualityFrame(Tables.documents(spark, dir))
      .select(col("quality_score").as("s"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
    val bins = f
      .withColumn("bin",
        least(floor(col("s") * IsoBins), lit(IsoBins - 1L)).cast("int"))
      .groupBy("bin").agg(count(lit(1)).as("n"), sum("y").as("pos"))
    // rank + cumulative sums over the ≤B-row aggregate (window-over-
    // aggregate: the §2.334 allowance)
    val wc = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = bins
      .withColumn("rk", row_number().over(Window.orderBy("bin")))
      .withColumn("cn", sum("n").over(wc))
      .withColumn("cp", sum("pos").over(wc))
    val i = c.select(col("rk").as("i"), col("bin"), col("n"), col("pos"))
    val pj = c.select(col("rk").as("j"),
      (col("cp") - col("pos")).as("cp0"), (col("cn") - col("n")).as("cn0"))
    val pk = c.select(col("rk").as("k"),
      col("cp").as("cpk"), col("cn").as("cnk"))
    // (i, j ≤ i, k ≥ i) grid — every interval rate as exact e6 units
    val tri = i.join(broadcast(pj), col("j") <= col("i"))
      .join(broadcast(pk), col("k") >= col("i"))
      .withColumn("r_e6", expr(
        "(2 * (cpk - cp0) * 1000000 + (cnk - cn0)) div (2 * (cnk - cn0))"))
    val iso = tri
      .groupBy("i", "bin", "n", "pos", "j")
      .agg(min("r_e6").as("mn"))
      .groupBy("i", "bin", "n", "pos")
      .agg(max("mn").as("iso_e6"))
      .withColumn("raw_e6",
        expr("(2 * pos * 1000000 + n) div (2 * n)"))
    iso
      .withColumn("adj_sum",
        sum(col("n") * abs(col("raw_e6") - col("iso_e6")))
          .over(Window.partitionBy(lit(1))))
      .withColumn("n_total",
        sum("n").over(Window.partitionBy(lit(1))))
      .select(col("bin"), col("n"), col("pos"),
        round(col("raw_e6").cast("double") / 1e6, 6).as("raw_rate"),
        round(col("iso_e6").cast("double") / 1e6, 6).as("iso_rate"),
        round(col("adj_sum").cast("double") /
          (col("n_total").cast("double") * 1e6), 6).as("mean_abs_adjust"))
      .orderBy("bin")
  }

  val isotonicCalibrationSql: String = {
    import graft.text.TextQueries.stopListSql
    s"""WITH f AS (SELECT
       |    round(0.4 * (length(regexp_replace(text, '[^a-z]', '', 'g')) / length(text))
       |      + 0.4 * (1.0 - abs(len(list_filter(_toks, t -> t IN ($stopListSql))) / n_tokens - 0.3))
       |      + 0.2 * least(1.0, n_tokens / 100.0), 6) AS s,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
       |  FROM (SELECT lang, text, string_split_regex(trim(text), '\\s+') AS _toks,
       |          CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS n_tokens
       |        FROM documents) t),
       |bins AS (SELECT CAST(least(floor(s * $IsoBins), ${IsoBins - 1}) AS INTEGER) AS bin,
       |    count(*) AS n, CAST(sum(y) AS BIGINT) AS pos
       |  FROM f GROUP BY 1),
       |c AS (SELECT bin, n, pos,
       |    row_number() OVER (ORDER BY bin) AS rk,
       |    CAST(sum(n) OVER (ORDER BY bin
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cn,
       |    CAST(sum(pos) OVER (ORDER BY bin
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cp
       |  FROM bins),
       |tri AS (SELECT i.rk AS i, i.bin, i.n, i.pos, j.rk AS j,
       |    (2 * (k.cp - (j.cp - j.pos)) * 1000000
       |      + (k.cn - (j.cn - j.n))) // (2 * (k.cn - (j.cn - j.n))) AS r_e6
       |  FROM c i JOIN c j ON j.rk <= i.rk JOIN c k ON k.rk >= i.rk),
       |inner_min AS (SELECT i, bin, n, pos, j, min(r_e6) AS mn
       |  FROM tri GROUP BY i, bin, n, pos, j),
       |iso AS (SELECT i, bin, n, pos, max(mn) AS iso_e6,
       |    (2 * pos * 1000000 + n) // (2 * n) AS raw_e6
       |  FROM inner_min GROUP BY i, bin, n, pos),
       |tot AS (SELECT CAST(sum(n * abs(raw_e6 - iso_e6)) AS BIGINT) AS adj_sum,
       |    CAST(sum(n) AS BIGINT) AS n_total FROM iso)
       |SELECT bin, n, pos,
       |  round(CAST(raw_e6 AS DOUBLE) / 1e6, 6) AS raw_rate,
       |  round(CAST(iso_e6 AS DOUBLE) / 1e6, 6) AS iso_rate,
       |  round(CAST(adj_sum AS DOUBLE) / (CAST(n_total AS DOUBLE) * 1e6), 6)
       |    AS mean_abs_adjust
       |FROM iso CROSS JOIN tot ORDER BY bin""".stripMargin
  }
}
