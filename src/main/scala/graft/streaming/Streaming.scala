package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import graft.Tables

/** Structured Streaming — SURVEY.md §2 items 33–35.
  *
  * The reference's roadmap ("simulate stream data and perform batch
  * processing every date at designated time", /root/reference/README.md
  * "Next") re-expressed as Structured Streaming: file-source ingest →
  * watermarked windowed aggregation / stateful dedup / sessionization.
  *
  * Every streaming transform is written against an unbounded DataFrame
  * and has a batch twin used by the DuckDB oracle; specs run the
  * streaming side on the same files via the memory sink and assert
  * parity with the batch side. Watermarks bound state at scale.
  */
object Streaming {

  /** events file-stream with the same schema/ts handling as the batch
    * loader: `ts` is either a nanos BIGINT (legacy corpus under
    * `nanosAsLong`) or an ordinary TIMESTAMP(MICROS). A file stream
    * needs a fixed schema up front, so sniff the physical type from
    * the parquet footer (one batch-read of the schema, no data scan)
    * and branch exactly like [[graft.Tables.events]]. */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    val tsIsLong =
      spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType == LongType
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", if (tsIsLong) LongType else TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet") // file source needs a dir
      .parquet(dir)
    if (tsIsLong) raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }

  /** Tumbling-window aggregation (streaming form, 10 min watermark). */
  def windowAggStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** §2.33 batch twin of the streaming window agg (oracle-checked). */
  def eventsWindowAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("win_start", "event_type")

  val eventsWindowAggSql: String =
    """SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS win_start,
      |  event_type, count(*) AS n, round(sum(value), 4) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin

  /** §2.35a streaming dedup: first event per event_id within watermark. */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** §2.56 watermarked stream-stream join: purchases joined to clicks
    * by the same user within [-30 min, 0]. Both sides watermarked so
    * the join state is bounded (Spark drops buffered rows older than
    * the watermark + interval). */
  def streamStreamJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("c_id"))
      .withWatermark("c_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
      .withWatermark("p_ts", "10 minutes")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("c_ts") <= col("p_ts"))
  }

  /** Batch twin of the stream-stream join (same predicate). */
  def streamStreamJoinBatch(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("c_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("c_ts") <= col("p_ts"))
  }

  final case class Tagged(user_id: Long, ts: java.sql.Timestamp,
      kind: Int, event_id: Long)
  final case class AsofOut(event_id: Long, user_id: Long,
      ts: java.sql.Timestamp, last_click_ts: java.sql.Timestamp)

  /** §2.86 streaming as-of join (the third as-of form, next to the
    * composed window and the custom exec): clicks and purchases ride
    * one keyed stream; per-user state is ONE long (latest click time),
    * so unlike the buffered stream-stream interval join the state is
    * O(1) per key with unbounded lookback. Each purchase emits with
    * the latest click at-or-before it. Within a micro-batch events are
    * processed in event-time order; across batches correctness needs
    * per-key event-time-ordered arrival (the usual stateful-stream
    * contract — a watermark-sorted upstream stage provides it). */
  // Timestamp↔micros without precision loss (getTime alone drops the
  // sub-millisecond part the events carry)
  private def tsMicros(t: java.sql.Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000
  private def microsTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000000 * 1000)
    t.setNanos((us % 1000000).toInt * 1000)
    t
  }

  def asofStream(events: DataFrame): Dataset[AsofOut] = {
    import events.sparkSession.implicits._
    val tagged = events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"),
        when(col("event_type") === "click", 0).otherwise(1).as("kind"),
        col("event_id"))
      .as[Tagged]
    tagged.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, AsofOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[Tagged], state: GroupState[Long]) =>
          // clicks sort before purchases at the same instant → a click
          // at exactly the purchase ts matches (inclusive, like the
          // batch twin and DuckDB ASOF)
          val sorted = evs.toArray.sortBy(e => (tsMicros(e.ts), e.kind, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer[AsofOut]()
          var lastClick = state.getOption.getOrElse(Long.MinValue)
          sorted.foreach { e =>
            if (e.kind == 0) lastClick = math.max(lastClick, tsMicros(e.ts))
            else out += AsofOut(e.event_id, userId, e.ts,
              if (lastClick == Long.MinValue) null else microsTs(lastClick))
          }
          state.update(lastClick)
          out.iterator
      }
  }

  final case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp,
      step: Int, event_id: Long)
  final case class FunnelStage(user_id: Long, stage: Int)

  /** §2.99 streaming funnel (the stateful twin of the batch
    * `events_funnel`): per-user state is THREE longs — micros of the
    * first view, the first click strictly after it, and the first
    * purchase strictly after that — monotone (set-once) per stage, so
    * state is O(1) per key with unbounded lookback, and each
    * micro-batch emits the user's current stage (Update mode). Within
    * a batch events are processed in (event-time, step, event_id)
    * order; across batches the usual stateful-stream contract applies
    * (per-key event-time-ordered arrival). Parity with the batch
    * funnel is asserted in StreamingSpec. */
  def funnelStream(events: DataFrame): Dataset[FunnelStage] = {
    import events.sparkSession.implicits._
    val steps = Map("view" -> 1, "click" -> 2, "purchase" -> 3)
    val tagged = events
      .filter(col("event_type").isin(steps.keys.toSeq.map(x => x: Any): _*))
      .select(col("user_id"), col("ts"),
        when(col("event_type") === "view", 1)
          .when(col("event_type") === "click", 2).otherwise(3).as("step"),
        col("event_id"))
      .as[FunnelEvent]
    val Unset = Long.MinValue
    tagged.groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Long, Long), FunnelStage](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[FunnelEvent],
            state: GroupState[(Long, Long, Long)]) =>
          var (t1, t2, t3) = state.getOption.getOrElse((Unset, Unset, Unset))
          val sorted = evs.toArray.sortBy(e => (tsMicros(e.ts), e.step, e.event_id))
          sorted.foreach { e =>
            val us = tsMicros(e.ts)
            e.step match {
              case 1 => if (t1 == Unset) t1 = us
              case 2 => if (t2 == Unset && t1 != Unset && us > t1) t2 = us
              case _ => if (t3 == Unset && t2 != Unset && us > t2) t3 = us
            }
          }
          state.update((t1, t2, t3))
          val stage = if (t3 != Unset) 3 else if (t2 != Unset) 2
            else if (t1 != Unset) 1 else 0
          FunnelStage(userId, stage)
      }
  }

  final case class FunnelWmState(t1: Long, t2: Long, t3: Long,
      pending: List[(Long, Int, Long)])

  /** §2.107 event-time funnel with a watermark — the out-of-order-safe
    * sequel to [[funnelStream]] (VERDICT r3 #6: there, a late view
    * arriving after an already-seen click silently misorders, because
    * (t1,t2,t3) are folded in ARRIVAL order across batches).
    *
    * Exactness argument: events with ts ≤ watermark can never arrive
    * again (the watermark contract), so they are folded ONCE into the
    * set-once (t1,t2,t3) prefix state in event-time order; everything
    * younger stays in a pending buffer that is re-sorted and re-folded
    * ON TOP of the prefix at every invocation — a late event landing
    * anywhere inside the pending window is therefore placed correctly.
    * Emitted stages are provisional until the watermark passes, but
    * the funnel stage is MONOTONE in the event set (adding events can
    * only lower the first-view min and grow the qualifying click/
    * purchase sets), so Update-mode consumers can safely keep
    * max(stage) per user. State is O(events within the watermark
    * horizon) per key — the price of exact out-of-order handling, and
    * the knob is the watermark delay. */
  def funnelStreamEventTime(events: DataFrame,
      delay: String = "10 minutes"): Dataset[FunnelStage] = {
    import events.sparkSession.implicits._
    val Unset = Long.MinValue
    val tagged = events
      .filter(col("event_type").isin("view", "click", "purchase"))
      .withWatermark("ts", delay)
      .select(col("user_id"), col("ts"),
        when(col("event_type") === "view", 1)
          .when(col("event_type") === "click", 2).otherwise(3).as("step"),
        col("event_id"))
      .as[FunnelEvent]
    tagged.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelWmState, FunnelStage](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, evs: Iterator[FunnelEvent], state: GroupState[FunnelWmState]) =>
          val st = state.getOption.getOrElse(FunnelWmState(Unset, Unset, Unset, Nil))
          val wmMs = state.getCurrentWatermarkMs()
          val all = st.pending ++
            evs.map(e => (tsMicros(e.ts), e.step, e.event_id))
          val sorted = all.sorted
          // fold is set-once per stage, applied in event-time order
          def fold(t: (Long, Long, Long), e: (Long, Int, Long)): (Long, Long, Long) = {
            val (t1, t2, t3) = t
            e._2 match {
              case 1 => if (t1 == Unset) (e._1, t2, t3) else t
              case 2 => if (t2 == Unset && t1 != Unset && e._1 > t1) (t1, e._1, t3) else t
              case _ => if (t3 == Unset && t2 != Unset && e._1 > t2) (t1, t2, e._1) else t
            }
          }
          val (done, tail) = sorted.partition(_._1 <= wmMs * 1000L)
          val fin = done.foldLeft((st.t1, st.t2, st.t3))(fold)
          state.update(FunnelWmState(fin._1, fin._2, fin._3, tail))
          if (tail.nonEmpty)
            // wake when the watermark reaches the oldest pending event
            // so the prefix keeps draining even if the user goes quiet
            state.setTimeoutTimestamp(math.max(tail.head._1 / 1000L, wmMs + 1L))
          val (p1, p2, p3) = tail.foldLeft(fin)(fold)
          val stage = if (p3 != Unset) 3 else if (p2 != Unset) 2
            else if (p1 != Unset) 1 else 0
          Iterator.single(FunnelStage(userId, stage))
      }
  }

  /** §2.57 foreachBatch incremental sink: each micro-batch upserted
    * into a parquet target by key (latest batch wins) — the streaming
    * version of the reference's scheduled batch load.
    * NOTE: the temp-dir swap below uses java.io.File, i.e. local
    * filesystems only; on a real cluster the same swap goes through the
    * Hadoop FileSystem API (or a table format with atomic commit). */
  def foreachBatchUpsert(events: DataFrame, targetDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val withVer = batch.withColumn("_version", lit(batchId))
        val merged =
          if (new java.io.File(targetDir).exists()) {
            val base = spark.read.parquet(targetDir)
            graft.etl.Loader.upsert(base, withVer, Seq("event_id"), "_version")
          } else withVer
        // write via temp + move: the source parquet is also the target
        val tmp = targetDir + "_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        val t = new java.io.File(targetDir)
        if (t.exists()) org.apache.commons.io.FileUtils.deleteDirectory(t)
        new java.io.File(tmp).renameTo(t)
        ()
      }
      .start()

  /** §2.319b incremental gold-layer maintenance: a foreachBatch-
    * maintained materialized rollup — per (event_type, day) count and
    * exact revenue cents — with EXACTLY-ONCE merge semantics, the
    * composition of §2.57's upsert sink and §2.67's AvailableNow
    * catch-up that the reference's roadmap ("batch processing every
    * date at designated time") points at. Each micro-batch collapses
    * to per-key ADDITIVE deltas (map-side combine eats the batch),
    * then merges into the persisted gold table: old ∪ delta → one
    * groupBy over a frame bounded by |event types| × calendar days —
    * never the corpus. Contract: after any micro-batch prefix the
    * table equals [[graft.etl.EtlQueries.goldRollup]]'s batch
    * recompute over the same events (spec-pinned, incl. restart).
    *
    * Exactly-once: foreachBatch re-runs a batch after failure, and an
    * additive merge would double-count a replay — so every row
    * carries `_last_batch` (the highest batchId merged) and
    * [[mergeGoldBatch]] SKIPS any batchId ≤ the stored watermark. The
    * temp-dir + rename swap makes watermark and data move together
    * atomically (same local-FS caveat as [[foreachBatchUpsert]];
    * production fences identically via a table format's atomic
    * commit). */
  def goldIncrementalStream(events: DataFrame, goldDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeGoldBatch(batch, batchId, goldDir)
      }
      .start()

  /** One gold merge step (factored out so the replay fence is directly
    * testable): aggregate `batch` to (event_type, day) deltas and fold
    * them into the table at `goldDir`, unless `batchId` was already
    * applied. */
  def mergeGoldBatch(batch: DataFrame, batchId: Long, goldDir: String): Unit = {
    val spark = batch.sparkSession
    val delta = batch.select(col("event_type"),
        date_trunc("day", col("ts")).as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n_events"), sum("cents").as("value_cents"))
    val target = new java.io.File(goldDir)
    // Crash-window recovery (ADVICE r10): a crash between the
    // stage-aside rename and the tmp->target rename leaves the table
    // only at goldDir+"_old". Deleting it here (as the pre-swap
    // cleanup used to) would rebuild gold from this delta alone and
    // silently discard all prior history — so if the target is gone
    // but the stage-aside exists, restore it FIRST and merge on top.
    val orphanBak = new java.io.File(goldDir + "_old")
    if (!target.exists() && orphanBak.exists() &&
        !orphanBak.renameTo(target))
      sys.error(s"gold merge: failed to restore staged-aside $goldDir" +
        "_old after an interrupted swap")
    val merged =
      if (target.exists()) {
        val base = spark.read.parquet(goldDir)
        // a zero-row gold table (possible after an empty first batch)
        // makes max(_last_batch) NULL — treat as "nothing applied yet"
        // instead of NPE-ing the stream (ADVICE r9)
        val appliedRow = base.agg(max("_last_batch")).head()
        val applied = if (appliedRow.isNullAt(0)) Long.MinValue
                      else appliedRow.getLong(0)
        if (applied >= batchId) return // replayed batch: already merged
        base.drop("_last_batch").unionByName(delta)
          .groupBy("event_type", "day")
          .agg(sum("n_events").as("n_events"),
            sum("value_cents").as("value_cents"))
      } else delta
    val tmp = goldDir + "_tmp"
    merged.withColumn("_last_batch", lit(batchId))
      .write.mode("overwrite").parquet(tmp)
    // Swap via stage-aside, not delete-then-rename: the old table is
    // only deleted AFTER the new one is in place, and every rename's
    // return value is checked so a failed swap fails the batch loudly
    // (foreachBatch will retry it) instead of silently losing the gold
    // table (ADVICE r9).
    val bak = new java.io.File(goldDir + "_old")
    if (bak.exists()) org.apache.commons.io.FileUtils.deleteDirectory(bak)
    if (target.exists() && !target.renameTo(bak))
      sys.error(s"gold merge: failed to stage aside existing $goldDir")
    if (!new java.io.File(tmp).renameTo(target)) {
      // restore the previous table, and say honestly whether it worked —
      // a failed restore is still recoverable (the entry-path orphan
      // check above picks _old up on the retry), but the operator
      // should know which state the table is in (ADVICE r10)
      val restored = bak.exists() && bak.renameTo(target)
      sys.error(s"gold merge: rename $tmp -> $goldDir failed; " +
        (if (restored) "previous table restored"
         else s"previous table left at ${goldDir}_old (next merge " +
           "restores it)"))
    }
    if (bak.exists()) org.apache.commons.io.FileUtils.deleteDirectory(bak)
    ()
  }

  /** Read the gold table in the [[graft.etl.EtlQueries.goldRollup]]
    * shape (derives avg_value, drops the merge watermark). */
  def readGold(spark: SparkSession, goldDir: String): DataFrame =
    spark.read.parquet(goldDir)
      .select(col("event_type"), col("day"), col("n_events"),
        col("value_cents"),
        round(col("value_cents").cast("double") / 100.0 / col("n_events"), 6)
          .as("avg_value"))
      .orderBy("event_type", "day")

  /** §2.122 streaming incremental dedup — the daily-crawl loop as a
    * stream, closing the §2.87/108/114 triangle: each micro-batch of
    * arriving documents is checked against the PERSISTED bkey-bucketed
    * band index (zero exchange on the index side, §2.108), the
    * verdicts are appended to a parquet log, and the batch's ACCEPTED
    * docs are appended to the index in its bucketed layout — with
    * bucket-preserving compaction past the file threshold (§2.114) —
    * so micro-batch N+1 dedups against everything batch N accepted,
    * across restarts (checkpointed source + on-disk index). At 100 TB
    * the only per-batch work is hashing/banding the batch itself plus
    * the bucket-aligned probe — the corpus-sized index is never
    * re-shuffled, which is what makes an always-on dedup service
    * affordable. Exactly-once note: foreachBatch can re-run a batch on
    * failure; the verdict append is idempotent per (batch_id, doc_id)
    * downstream, and index appends use the batch's accepted set, so a
    * replayed batch re-appends — production would fence by batchId in
    * a table format with atomic commit (same caveat as
    * [[foreachBatchUpsert]]'s local-FS swap). */
  def dedupStreamIndexed(docs: DataFrame, indexTable: String,
      verdictDir: String, checkpointDir: String,
      minEstJaccard: Double = 0.25): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val b = batch.persist() // read twice: verdicts + index append
        try {
          val verdicts = graft.dedup.Dedup
            .dedupIncrementalIndexed(spark, b, indexTable, minEstJaccard)
            .withColumn("batch_id", lit(batchId))
            .persist()
          try {
            verdicts.write.mode("append").parquet(verdictDir)
            val accepted = b.join(
              verdicts.filter(!col("is_duplicate")).select("doc_id"), "doc_id")
            graft.dedup.Dedup.appendBandIndex(accepted, indexTable)
            ()
          } finally { verdicts.unpersist(); () }
        } finally { b.unpersist(); () }
      }
      .start()

  /** §2.85 streaming DQ drift: per micro-batch, bin `value` into
    * fixed-width histograms and compute each bin's PSI term against a
    * static reference histogram (e.g. last week's accepted load) —
    * live drift monitoring on an arriving stream via foreachBatch,
    * appended to a parquet monitor log. `reference` rows:
    * (bin, ref_share). State is nothing: each batch is scored
    * independently against the broadcast reference. */
  def driftMonitorStream(events: DataFrame, reference: DataFrame,
      monitorDir: String, checkpointDir: String,
      binWidth: Double = 0.1): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val binned = batch
          .withColumn("bin", floor(col("value") / binWidth).cast("long"))
          .groupBy("bin").agg(count(lit(1)).as("n"))
        val tot = binned.agg(sum("n").as("t"))
        val eps = 1e-6
        val scored = binned.crossJoin(broadcast(tot))
          .join(broadcast(reference), Seq("bin"), "outer")
          .withColumn("p", greatest(coalesce(col("n") / col("t"), lit(0.0)), lit(eps)))
          .withColumn("q", greatest(coalesce(col("ref_share"), lit(0.0)), lit(eps)))
          .withColumn("psi_term", (col("p") - col("q")) * log(col("p") / col("q")))
          .agg(round(sum("psi_term"), 6).as("psi"))
          .withColumn("batch_id", lit(batchId))
        scored.write.mode("append").parquet(monitorDir)
        ()
      }
      .start()

  /** Scheduled-batch trigger: the reference's roadmap item "batch
    * processing every date at designated time"
    * (/root/reference/README.md "Next") maps to Trigger.AvailableNow —
    * an externally-scheduled (cron/Airflow) run starts the stream,
    * processes everything that arrived since the last checkpoint in
    * bounded micro-batches, and exits. Catch-up batch semantics with
    * streaming bookkeeping: exactly-once via the checkpoint, no
    * always-on cluster. Sink here is the memory sink for spec parity;
    * production swaps in parquet/foreachBatch with the same trigger. */
  def scheduledCatchupBatch(transformed: DataFrame, queryName: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    transformed.writeStream.outputMode("complete")
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName(queryName)
      .start()

  /** §2.155 streaming approximate top-k: the SpaceSaving heavy-hitter
    * sketch (§2's `heavy_hitters` batch aggregate) as an unbounded
    * streaming aggregate. The sketch state is a BOUNDED k-counter map
    * whatever the stream length or item cardinality — the property
    * that makes top-k feasible on an infinite stream where exact
    * per-item counts would grow state without bound. Complete-mode
    * global aggregate: each micro-batch partial-aggregates its items
    * map-side and merges into the sketch (TypedImperativeAggregate
    * merge path), so the guarantee — any item with true count
    * > N/capacity is in the candidate set — survives arbitrary
    * arrival order and batching (merge is the same associative op the
    * batch twin uses). */
  def topkItemsStream(events: DataFrame, capacity: Int): DataFrame =
    events.filter(col("event_type") === "click")
      .select(get_json_object(col("props"), "$.k").as("item"))
      .agg(graft.functions.SpaceSaving.space_saving(col("item"), capacity)
        .as("candidates"))

  /** §2.181 streaming quantiles: the §2.156 KLL sketch as a streaming
    * aggregate — per event_type running p50/p90/p99 of `value` under
    * complete mode. State per group is ONE O(k log n) sketch (the
    * same mergeable Buf the batch twin uses), updated incrementally
    * per micro-batch — never a re-sort of history, which is the whole
    * point at an unbounded 100 TB/day firehose. The KLL rank guarantee
    * (ε ≈ 1.33/k·√(levels)) holds under ANY batching/merge order, so
    * the spec pins the estimate against exact quantiles of the full
    * stream rather than a bit-identical replay (KLL results are
    * merge-order-sensitive by design; the guarantee is not). */
  def quantilesStream(events: DataFrame, k: Int = 200): DataFrame =
    events.groupBy(col("event_type"))
      .agg(graft.functions.KllQuantile
        .kll_quantile(col("value"), k, Seq(0.5, 0.9, 0.99)).as("qs"))

  /** §2.201 streaming distinct users: the §2.160 HLL sketch as a
    * streaming aggregate — per event_type running distinct-user
    * estimate under complete mode, 4 KB register state per group
    * whatever the stream length. Unlike KLL (whose estimates are
    * merge-order-sensitive within the error bound), HLL registers
    * merge by element-wise MAX — fully associative/commutative — so
    * ANY micro-batching yields BIT-IDENTICAL registers to the batch
    * twin: the spec asserts exact estimate equality, not a tolerance,
    * plus the ~1.6% accuracy vs exact distinct. The unbounded-stream
    * "how many users ever" counter a 100 TB/day firehose needs at
    * constant state. */
  def distinctUsersStream(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(graft.functions.HllSketch.hll_sketch(
        graft.text.TextFunctions.hash64(col("user_id").cast("string")))
        .as("hll_users"))

  /** §2.214 streaming day-grain HLL register maintenance — the
    * production half of §2.202's merged-rollup story: the stream keeps
    * ONE 4 KB register row per day (state bounded by days, never
    * events), and because max-merge is associative+commutative the
    * registers are BIT-IDENTICAL to a batch rebuild whatever the
    * micro-batch boundaries — so any trailing-window / cross-slice
    * distinct rollup (§2.202's WAU) reads this table instead of
    * re-scanning the corpus. The ingest loop maintains the state; the
    * rollup is day-grain arithmetic downstream. */
  def dayRegistersStream(events: DataFrame): DataFrame =
    events.groupBy(to_date(col("ts")).as("day"))
      .agg(graft.functions.HllRegisters.hll_registers(
        graft.text.TextFunctions.hash64(col("user_id").cast("string")))
        .as("regs"))

  /** §2.269 streaming slice monitor: the §2.243 slice frame as a
    * streaming aggregate — per (dim, slice), running event and
    * error-event counts under complete mode. Counts are plain
    * mergeable sums, so ANY micro-batching yields counts IDENTICAL
    * to the batch op's slice frame (spec-asserted as exact equality);
    * the z-scores §2.243 derives are row-local arithmetic a sink
    * applies downstream. State is slice-cardinality-bounded (≤21
    * rows) whatever the stream length. */
  def sliceMonitorStream(events: DataFrame): DataFrame = {
    val ev = events
      .withColumn("item",
        get_json_object(col("props"), "$.k").cast("int"))
      .filter(col("item").isNotNull)
      .select(
        (col("event_type") === "error").cast("long").as("is_err"),
        dayofweek(col("ts")).cast("string").as("dow"),
        concat(lit("h"), (floor(hour(col("ts")) / 6) * 6).cast("string"))
          .as("hour_band"),
        floor(col("item") / 10).cast("string").as("item_decile"))
    ev.select(col("is_err"), expr(
      "stack(3, 'dow', dow, 'hour_band', hour_band, " +
        "'item_decile', item_decile) AS (dim, slice)"))
      .groupBy("dim", "slice")
      .agg(count(lit(1)).as("n"), sum("is_err").as("n_err"))
  }

  final case class EwmaOut(event_type: String, n_days: Long, ewma: Double)

  /** §2.256 streaming EWMA monitor: the §2.244 smoothing state kept
    * live per event type via mapGroupsWithState. The EWMA fold is
    * ORDER-SENSITIVE, so streaming it naively (fold as events arrive)
    * would make the answer depend on micro-batch boundaries; instead
    * the state is the DAY-GRAIN count map (calendar-bounded — the
    * §2.214 bounded-state argument) and each trigger re-folds the
    * zero-filled day series from that state. Result: the emitted EWMA
    * after any batching is BIT-IDENTICAL to the batch twin — the spec
    * asserts exact equality against [[graft.analytics.Series]]'
    * fold, split across micro-batches. Re-fold cost is days-sized,
    * not events-sized. */
  def ewmaStateStream(events: Dataset[Event]): Dataset[EwmaOut] = {
    import events.sparkSession.implicits._
    val a = graft.analytics.Series.EwmaAlpha
    events.groupByKey(_.event_type)
      .mapGroupsWithState[Map[Long, Long], EwmaOut](
        GroupStateTimeout.NoTimeout) {
        (et: String, evs: Iterator[Event], state: GroupState[Map[Long, Long]]) =>
          val cur = state.getOption.getOrElse(Map.empty[Long, Long])
          val upd = evs.foldLeft(cur) { (m, e) =>
            val d = e.ts.toLocalDateTime.toLocalDate.toEpochDay
            m + (d -> (m.getOrElse(d, 0L) + 1L))
          }
          state.update(upd)
          val (d0, d1) = (upd.keys.min, upd.keys.max)
          val xs = (d0 to d1).map(d => upd.getOrElse(d, 0L).toDouble)
          val ewma = xs.tail.foldLeft(xs.head)((acc, x) =>
            acc * (1 - a) + x * a)
          EwmaOut(et, xs.length.toLong, ewma)
      }
  }

  // ---- sessionization ----

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  val SessionGapMinutes = 30

  /** §2.35b stateful sessionization via flatMapGroupsWithState: emits a
    * session when the gap since the last event exceeds the threshold.
    * State per user is one (start, last, count) triple — bounded. */
  def sessionizeStream(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = SessionGapMinutes * 60000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Long), Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[Event], state: GroupState[(Long, Long, Long)]) =>
          // batch-mode invocation: all of the user's events arrive at once
          val sorted = evs.toArray.sortBy(e => (e.ts.getTime, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer[Session]()
          var cur = state.getOption
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some((start, last, n)) if t - last <= gapMs =>
                cur = Some((start, t, n + 1))
              case Some((start, last, n)) =>
                out += Session(userId, new java.sql.Timestamp(start),
                  new java.sql.Timestamp(last), n)
                cur = Some((t, t, 1L))
              case None =>
                cur = Some((t, t, 1L))
            }
          }
          // flush the trailing session (batch semantics; a streaming run
          // would keep it in state until timeout)
          cur.foreach { case (start, last, n) =>
            out += Session(userId, new java.sql.Timestamp(start),
              new java.sql.Timestamp(last), n)
          }
          state.remove()
          out.iterator
      }
  }

  /** §2.35c batch sessionization twin: lag + gap-flag + running count
    * (two windows over one user-partitioned sort — oracle-checked). */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > SessionGapMinutes * 60L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "session_id")
  }

  val sessionizeSql: String =
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
       |    CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
       |           OR date_diff('second', lag(CAST(ts AS TIMESTAMP)) OVER w,
       |                CAST(ts AS TIMESTAMP)) > ${SessionGapMinutes * 60} THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sessions AS (
       |  SELECT user_id, ts,
       |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |  FROM flagged)
       |SELECT user_id, session_id, min(ts) AS session_start,
       |  max(ts) AS session_end, count(*) AS n_events
       |FROM sessions GROUP BY user_id, session_id
       |ORDER BY user_id, session_id""".stripMargin

  /** §2.287 streaming winnow dedup: the §2.278 winnowing kernel as an
    * always-on service — per micro-batch, arriving documents are
    * winnow-fingerprinted (the same compiled gram + argmin-window
    * kernel, so a batch and a stream produce IDENTICAL fingerprints),
    * probed against a PERSISTED (doc_id, h) fingerprint index, and a
    * verdict row is appended per doc: duplicate iff it shares ≥
    * `minShared` fingerprints with any single indexed doc. Accepted
    * docs' fingerprints append to the index, so batch N+1 dedups
    * against everything batch N accepted, across restarts
    * (checkpointed source + on-disk index). Completes the family:
    * exact→§2.118 bloom stream, MinHash→§2.122 indexed stream,
    * winnow→this — the guarantee-carrying member (shared runs ≥
    * w+k−1 tokens CANNOT slip through between batches, because the
    * fingerprints are deterministic and the index is cumulative).
    *
    * Per-batch work is batch-sized fingerprinting plus a fingerprint-
    * keyed probe join — the index is read by hash key, never
    * re-fingerprinted. Same exactly-once caveat as
    * [[dedupStreamIndexed]]: verdicts idempotent per (batch_id,
    * doc_id); production fences index appends by batchId in a table
    * format with atomic commit. */
  def winnowStreamIndexed(docs: DataFrame, indexDir: String,
      verdictDir: String, checkpointDir: String,
      minShared: Int = graft.dedup.Winnow.WinnowMinShared)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val fp = graft.dedup.Winnow.fingerprintsOf(batch)
          .select("doc_id", "h").distinct().persist()
        try {
          val haveIndex =
            new java.io.File(indexDir).listFiles() != null &&
            new java.io.File(indexDir).listFiles().nonEmpty
          val dupIds =
            if (!haveIndex) spark.range(0).select(col("id").as("doc_id"))
            else {
              val idx = spark.read.parquet(indexDir)
                .select(col("doc_id").as("idx_doc"), col("h"))
              fp.join(idx.hint("shuffle_hash"), Seq("h"))
                .groupBy("doc_id", "idx_doc")
                .agg(count(lit(1)).as("n_shared"))
                .filter(col("n_shared") >= minShared)
                .select("doc_id").distinct()
            }
          val verdicts = batch.select("doc_id")
            .join(dupIds.withColumn("is_duplicate", lit(true)), Seq("doc_id"), "left")
            .select(col("doc_id"),
              coalesce(col("is_duplicate"), lit(false)).as("is_duplicate"),
              lit(batchId).as("batch_id"))
            .persist()
          try {
            verdicts.write.mode("append").parquet(verdictDir)
            val accepted = fp.join(
              verdicts.filter(!col("is_duplicate")).select("doc_id"), "doc_id")
            accepted.write.mode("append").parquet(indexDir)
            ()
          } finally { verdicts.unpersist(); () }
        } finally { fp.unpersist(); () }
      }
      .start()
}
