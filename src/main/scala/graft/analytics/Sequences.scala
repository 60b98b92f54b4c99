package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Sequential-pattern mining over session event streams — SURVEY.md
  * §2.280.
  */
object Sequences {

  /** Pattern length (consecutive event types). */
  val SeqN = 3

  /** Patterns reported. */
  val SeqTopK = 20

  /** §2.280 `seq_patterns`: frequent length-[[SeqN]] CONSECUTIVE
    * event-type sequences within §2.36's 30-minute-gap sessions —
    * support counts + share of all sequence occurrences. The
    * PrefixSpan-lite next step after §2.137's first-order transitions
    * (pairs can't distinguish view→click→purchase from
    * view→click→error; trigrams can) and beneath §2.145's full-path
    * report (whole paths fragment the support over every length —
    * fixed-length windows aggregate it).
    *
    * Scale shape: ONE user_id exchange + per-user sort shared by the
    * session window and both leads (same WindowSpec, they fuse); the
    * trigram groupBy partial-aggregates map-side into a ≤|types|³
    * frame; total occurrences is a 1-row broadcast off that bounded
    * frame; distributed TakeOrderedAndProject top-k.
    *
    * Determinism: counts are exact BIGINTs; share is one division
    * rounded 6 dp; ties rank by pattern string. */
  def seqPatterns(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapSec = graft.streaming.Streaming.SessionGapMinutes * 60L
    val sess = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .withColumn("new_session",
        when(lag(col("ts"), 1).over(byUser).isNull ||
          col("ts").cast("long") - lag(col("ts"), 1).over(byUser).cast("long")
            > gapSec, 1L).otherwise(0L))
      .withColumn("session_id", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bySess = Window.partitionBy("user_id", "session_id")
      .orderBy("ts", "event_id")
    val tri = sess
      .withColumn("t2", lead(col("event_type"), 1).over(bySess))
      .withColumn("t3", lead(col("event_type"), 2).over(bySess))
      .filter(col("t2").isNotNull && col("t3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("t2"), col("t3"))
        .as("pattern"))
      .groupBy("pattern").agg(count(lit(1)).as("n_occ"))
    val total = tri.agg(sum("n_occ").as("tot"))
    val top = tri.crossJoin(broadcast(total))
      .select(col("pattern"), col("n_occ"),
        round(col("n_occ").cast("double") / col("tot"), 6).as("share"))
      .orderBy(desc("n_occ"), col("pattern")).limit(SeqTopK)
    top.withColumn("rk", row_number().over(
        Window.orderBy(desc("n_occ"), col("pattern"))))
      .select("rk", "pattern", "n_occ", "share")
      .orderBy("rk")
  }

  val seqPatternsSql: String = {
    val gapSec = graft.streaming.Streaming.SessionGapMinutes * 60L
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
       |    CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
       |           OR date_diff('second', lag(CAST(ts AS TIMESTAMP)) OVER w,
       |                CAST(ts AS TIMESTAMP)) > $gapSec
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sess AS (
       |  SELECT user_id, event_id, event_type, ts,
       |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
       |  FROM flagged),
       |tri AS (
       |  SELECT event_type || '>' || t2 || '>' || t3 AS pattern,
       |    count(*) AS n_occ
       |  FROM (SELECT event_type,
       |      lead(event_type, 1) OVER ws AS t2,
       |      lead(event_type, 2) OVER ws AS t3
       |    FROM sess
       |    WINDOW ws AS (PARTITION BY user_id, session_id
       |      ORDER BY ts, event_id)) t
       |  WHERE t2 IS NOT NULL AND t3 IS NOT NULL
       |  GROUP BY 1),
       |tot AS (SELECT CAST(sum(n_occ) AS BIGINT) AS tot FROM tri)
       |SELECT row_number() OVER (ORDER BY n_occ DESC, pattern) AS rk,
       |  pattern, n_occ,
       |  round(CAST(n_occ AS DOUBLE) / tot, 6) AS share
       |FROM tri CROSS JOIN tot
       |ORDER BY n_occ DESC, pattern LIMIT $SeqTopK""".stripMargin
  }
}
