package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Parameter-sweep and mixture diagnostics — SURVEY.md §2.262–263.
  */
object Sweeps {

  /** Gap thresholds swept by [[sessionGapSweep]], minutes. */
  val SweepGapsMin: Seq[Int] = Seq(15, 30, 60)

  /** §2.262 `session_gap_sweep`: sessionization-parameter sensitivity
    * — session counts, single-event share, events/session and mean
    * duration at gap = 15/30/60 min, in ONE pass. The §2.36 pipeline
    * hard-codes 30 min; this is the analysis that justifies (or
    * indicts) that constant: if the metrics still swing between 15
    * and 60, the choice is load-bearing and deserves monitoring.
    *
    * Scale shape: one user_id exchange and ONE per-user sort shared
    * by all three session-id running sums (3 windows over the same
    * sort order fuse); per-(user, session) aggregates are
    * session-sized; the report is 3 rows.
    *
    * Determinism: gaps and durations are exact integer MICROSECONDS
    * (§2.261's lesson); the three reported means are single divisions
    * of integer sums. */
  def sessionGapSweep(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("gap", col("us") - lag("us", 1).over(w))
    val sweeps = SweepGapsMin.map { g =>
      val gapUs = g * 60L * 1000000L
      val sid = sum(when(col("gap").isNull || col("gap") > gapUs, 1L)
        .otherwise(0L)).over(w)
      val sess = ev.withColumn("sid", sid)
        .groupBy("user_id", "sid")
        .agg(count(lit(1)).as("n_ev"),
          (max("us") - min("us")).as("dur_us"))
      sess.agg(count(lit(1)).as("n_sessions"),
        sum("n_ev").as("n_events"),
        sum(when(col("n_ev") === 1, 1L).otherwise(0L)).as("n_single"),
        sum("dur_us").as("dur_us"))
        .select(lit(g.toLong).as("gap_minutes"), col("n_sessions"),
          round(col("n_events").cast("double") / col("n_sessions"), 4)
            .as("events_per_session"),
          round(col("n_single").cast("double") / col("n_sessions"), 6)
            .as("single_event_share"),
          round(col("dur_us").cast("double") / col("n_sessions") / 1e6, 4)
            .as("mean_duration_sec"))
    }
    sweeps.reduce(_ unionAll _).orderBy("gap_minutes")
  }

  val sessionGapSweepSql: String = {
    def one(g: Int): String = {
      val gapUs = g * 60L * 1000000L
      s"""SELECT CAST($g AS BIGINT) AS gap_minutes,
         |  count(*) AS n_sessions,
         |  round(CAST(sum(n_ev) AS DOUBLE) / count(*), 4)
         |    AS events_per_session,
         |  round(CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 6) AS single_event_share,
         |  round(CAST(sum(dur_us) AS DOUBLE) / count(*) / 1e6, 4)
         |    AS mean_duration_sec
         |FROM (SELECT user_id, sid, count(*) AS n_ev,
         |    CAST(max(us) - min(us) AS BIGINT) AS dur_us
         |  FROM (SELECT user_id, us,
         |      CAST(sum(CASE WHEN gap IS NULL OR gap > $gapUs
         |        THEN 1 ELSE 0 END) OVER
         |        (PARTITION BY user_id ORDER BY us, event_id
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |        AS BIGINT) AS sid
         |    FROM ev) s
         |  GROUP BY 1, 2) t""".stripMargin
    }
    s"""WITH ev AS (SELECT user_id, event_id,
       |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
       |    epoch_us(CAST(ts AS TIMESTAMP))
       |      - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
       |        (PARTITION BY user_id
       |         ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS gap
       |  FROM events)
       |${one(15)}
       |UNION ALL
       |${one(30)}
       |UNION ALL
       |${one(60)}
       |ORDER BY gap_minutes""".stripMargin
  }

  /** §2.263 `source_lang_mix`: per-source language-mix profile — doc
    * count, language count, Shannon entropy of the language
    * distribution (nats), evenness H/ln(k), and the dominant
    * language's share. The §2.75 mixture designer's second axis
    * (§2.252 asks "do sources repeat each other's CONTENT"; this
    * asks "do they cover different LANGUAGES").
    *
    * Determinism: H = ln N − Σc·ln(c)/N with every log argument an
    * exact integer (the §2.95 convention) over ≤|langs| cells per
    * source; dominant share via max() of integers. */
  def sourceLangMix(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.documents(spark, dir)
      .groupBy("source", "lang").agg(count(lit(1)).as("c"))
    cells.groupBy("source")
      .agg(sum("c").as("n_docs"), count(lit(1)).as("n_langs"),
        sum(col("c").cast("double") * log(col("c").cast("double")))
          .as("clnc"),
        max("c").as("top_c"))
      .select(col("source"), col("n_docs"), col("n_langs"),
        round(log(col("n_docs").cast("double")) -
          col("clnc") / col("n_docs").cast("double"), 4).as("lang_entropy"),
        round((log(col("n_docs").cast("double")) -
          col("clnc") / col("n_docs").cast("double")) /
          log(col("n_langs").cast("double")), 4).as("evenness"),
        round(col("top_c").cast("double") / col("n_docs"), 6)
          .as("top_lang_share"))
      .filter(col("n_langs") > 1)
      .orderBy("source")
  }

  val sourceLangMixSql: String =
    """WITH cells AS (SELECT source, lang, count(*) AS c
      |  FROM documents GROUP BY 1, 2),
      |agg AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
      |    count(*) AS n_langs,
      |    sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS clnc,
      |    CAST(max(c) AS BIGINT) AS top_c
      |  FROM cells GROUP BY 1)
      |SELECT source, n_docs, n_langs,
      |  round(ln(CAST(n_docs AS DOUBLE)) - clnc / n_docs, 4)
      |    AS lang_entropy,
      |  round((ln(CAST(n_docs AS DOUBLE)) - clnc / n_docs)
      |    / ln(CAST(n_langs AS DOUBLE)), 4) AS evenness,
      |  round(CAST(top_c AS DOUBLE) / n_docs, 6) AS top_lang_share
      |FROM agg WHERE n_langs > 1
      |ORDER BY source""".stripMargin
}
