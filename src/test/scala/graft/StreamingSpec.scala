package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.Streaming

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  test("streaming window agg matches the batch twin") {
    val q = Streaming.windowAggStream(Streaming.readEventsStream(spark, sf))
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    q.processAllAvailable(); q.stop()
    val stream = spark.table("win_out")
      .orderBy("win_start", "event_type").collect()
    val batch = Streaming.eventsWindowAgg(spark, sf).collect()
    assert(stream.length == batch.length)
    assert(stream.zip(batch).forall { case (a, b) => a == b })
  }

  test("streaming dedup drops duplicate event_ids") {
    val q = Streaming.dedupStream(Streaming.readEventsStream(spark, sf))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    q.processAllAvailable(); q.stop()
    val n = spark.table("dedup_out").count()
    val exact = Tables.events(spark, sf).select("event_id").distinct().count()
    assert(n == exact)
  }

  test("Trigger.AvailableNow runs a scheduled catch-up batch and stops") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val q = Streaming.scheduledCatchupBatch(
      Streaming.windowAggStream(Streaming.readEventsStream(spark, sf)),
      "sched_out", ckpt)
    q.awaitTermination(120000)
    assert(!q.isActive, "AvailableNow query should self-terminate")
    val stream = spark.table("sched_out")
      .orderBy("win_start", "event_type").collect()
    val batch = Streaming.eventsWindowAgg(spark, sf).collect()
    assert(stream.length == batch.length && stream.nonEmpty)
    assert(stream.zip(batch).forall { case (a, b) => a == b })
  }

  test("stateful sessionization matches the batch window twin") {
    import spark.implicits._
    val evs = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Streaming.Event]
    val stateful = Streaming.sessionizeStream(evs)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"))
      .orderBy("user_id").collect()
    val batch = Streaming.sessionize(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"))
      .orderBy("user_id").collect()
    assert(stateful.length == batch.length)
    assert(stateful.zip(batch).forall { case (a, b) => a == b })
  }

  test("multimodal typed decode equals the Column-op feature query") {
    import spark.implicits._
    import graft.multimodal.Multimodal
    val media = Multimodal.withPayload(Tables.documents(spark, sf))
      .select("doc_id", "payload").as[Multimodal.MediaRow]
    val typed = Multimodal.decodeFeatures(media)
      .select("doc_id", "n_alpha", "n_digit", "n_space")
      .orderBy("doc_id").collect()
    val colops = Multimodal.mmFeatures(spark, sf)
      .select("doc_id", "n_alpha", "n_digit", "n_space")
      .orderBy("doc_id").collect()
    assert(typed.length == colops.length && typed.nonEmpty)
    assert(typed.zip(colops).forall { case (a, b) => a == b })
  }

  test("streaming as-of join matches the batch as-of on the events file") {
    val q = Streaming.asofStream(Streaming.readEventsStream(spark, sf))
      .writeStream.outputMode("append")
      .format("memory").queryName("asof_stream_out").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("asof_stream_out")
      .select("event_id", "user_id", "ts", "last_click_ts")
      .orderBy("event_id").collect()
    val batch = graft.analytics.Queries.asofJoin(spark, sf)
      .select("event_id", "user_id", "ts", "last_click_ts")
      .orderBy("event_id").collect()
    assert(streamed.length == batch.length && streamed.nonEmpty)
    val diffs = streamed.zip(batch).filter { case (a, b) => a != b }
    assert(diffs.isEmpty, s"${diffs.length} diffs, first: ${diffs.headOption}")
  }

  test("streaming funnel stages match the batch events_funnel counts") {
    val q = Streaming.funnelStream(Streaming.readEventsStream(spark, sf))
      .toDF.writeStream.outputMode("update")
      .format("memory").queryName("funnel_stream_out").start()
    q.processAllAvailable(); q.stop()
    // Update mode: per-user stage is monotone across batches, so max is
    // the final stage (deterministic even if micro-batches reorder rows)
    val lastStage = spark.table("funnel_stream_out")
      .groupBy("user_id").agg(org.apache.spark.sql.functions.max("stage").as("stage"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val batch = graft.analytics.Queries.eventsFunnel(spark, sf)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(lastStage.values.count(_ >= 1).toLong == batch("view"))
    assert(lastStage.values.count(_ >= 2).toLong == batch("click"))
    assert(lastStage.values.count(_ >= 3).toLong == batch("purchase"))
  }

  test("mm_dedup pairs identical payloads at hamming 0 and respects the cap") {
    import graft.multimodal.Multimodal
    val pairs = Multimodal.mmDedup(spark, sf).collect()
    assert(pairs.forall(_.getLong(2) <= Multimodal.MaxHamming))
    // identical texts (exact dupes exist in the corpus) → hamming 0 pairs present
    val exact = graft.dedup.Dedup.exactDedup(Tables.documents(spark, sf))
      .filter(col("group_size") > 1)
    if (exact.count() > 0) assert(pairs.exists(_.getLong(2) == 0L))
  }

  test("stateful streaming runs on the RocksDB state store with identical results") {
    // production state backend: spillable, not JVM-heap-bound like the
    // default HDFSBackedStateStore — the 100-TB configuration
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = Streaming.funnelStream(Streaming.readEventsStream(spark, sf))
        .toDF.writeStream.outputMode("update")
        .format("memory").queryName("funnel_rocksdb_out").start()
      q.processAllAvailable(); q.stop()
      val lastStage = spark.table("funnel_rocksdb_out")
        .groupBy("user_id").agg(org.apache.spark.sql.functions.max("stage").as("stage"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val batch = graft.analytics.Queries.eventsFunnel(spark, sf)
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
      assert(lastStage.values.count(_ >= 1).toLong == batch("view"))
      assert(lastStage.values.count(_ >= 3).toLong == batch("purchase"))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming drift monitor scores each micro-batch against a reference") {
    import spark.implicits._
    val dirs = java.nio.file.Files.createTempDirectory("graft-drift")
    val monitorDir = s"$dirs/monitor"
    val ckpt = s"$dirs/ckpt"
    // reference histogram = the batch events' own distribution → a
    // stream of the same file must score PSI ≈ 0
    val binWidth = 0.1
    val ev = Tables.events(spark, sf)
    val ref = ev.withColumn("bin", floor(col("value") / binWidth).cast("long"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
    val total = ref.agg(sum("n")).head().getLong(0).toDouble
    val reference = ref.select(col("bin"), (col("n") / total).as("ref_share"))
    val q = Streaming.driftMonitorStream(
      Streaming.readEventsStream(spark, sf), reference, monitorDir, ckpt, binWidth)
    q.processAllAvailable(); q.stop()
    val psi = spark.read.parquet(monitorDir).collect()
    assert(psi.nonEmpty)
    assert(psi.forall(_.getDouble(0) < 0.01),
      s"self-referenced stream must be stable: ${psi.map(_.getDouble(0)).mkString(",")}")
  }

  test("composed sessionization matches Spark's built-in session_window") {
    import org.apache.spark.sql.expressions.Window
    // session_window merges an event iff gap < threshold (half-open
    // window), so the lag/cumsum twin here uses >= for the new-session
    // flag; the oracle-checked `sessionize` uses > (exact-boundary
    // events merge) — both are valid conventions, this test pins the
    // composed formulation against Spark's native operator under the
    // native operator's convention.
    val ev = Tables.events(spark, sf)
    val builtin = ev
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("s"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val twin = ev
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("ns", when(col("prev_ts").isNull ||
        col("ts").cast("long") - col("prev_ts").cast("long") >= 1800L, 1L).otherwise(0L))
      .withColumn("sid", sum(col("ns")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min(col("ts")).as("s"), count(lit(1)).as("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(2), r.getLong(3))).toSet
    assert(builtin.nonEmpty && builtin == twin)
  }

  test("resize downsamples to a fixed byte budget, identity at target size") {
    import spark.implicits._
    import graft.multimodal.Multimodal
    val out = Multimodal.mmResize(spark, sf).collect()
    assert(out.length == Tables.documents(spark, sf).count())
    assert(out.forall(_.getInt(2) == Multimodal.ResizeTo))
    assert(out.forall(r => r.getDouble(5) > 30 && r.getDouble(5) < 200))
    // a payload already at the target size resizes to itself:
    // src_i = j*target div target = j (nearest-neighbor identity)
    val n = Multimodal.ResizeTo
    val probe = Seq((0L, "x" * n, "en", "src0", n.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    probe.createOrReplaceTempView("___ignore") // keep schema parity obvious
    val hexed = probe.select(
      graft.text.TextFunctions.hash64(hex(encode(col("text"), "utf-8"))).as("h"))
      .head().getLong(0)
    // run the same projection pipeline on the probe frame via the query
    // shape: payload == resized payload => checksums equal
    val row = Multimodal.mmResize(spark, sf) // corpus call compiles the path
    assert(row.columns.contains("resized_checksum"))
    val self = probe
      .withColumn("phex", hex(encode(col("text"), "utf-8")))
      .withColumn("rhex",
        expr(s"""concat_ws('', transform(sequence(0, ${n - 1}),
          j -> substr(phex, CAST((CAST(j AS BIGINT) * $n div $n) * 2 + 1 AS INT), 2)))"""))
      .select(graft.text.TextFunctions.hash64(col("rhex")).as("h"))
      .head().getLong(0)
    assert(self == hexed)
  }

  test("frame sampling: N evenly-spaced full frames per document") {
    import graft.multimodal.Multimodal
    val frames = Multimodal.mmFrames(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(frames.length == nDocs * Multimodal.NFrames)
    frames.groupBy(_.getLong(0)).foreach { case (doc, fs) =>
      val sorted = fs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).sameElements(0 until Multimodal.NFrames))
      // offsets non-decreasing; frame 0 starts at byte 0
      val offs = sorted.map(_.getLong(2))
      assert(offs.head == 0L)
      assert(offs.zip(offs.tail).forall { case (a, b) => a <= b }, s"doc $doc offs")
      // full frames unless the payload itself is shorter
      assert(fs.forall(r => r.getLong(3) == Multimodal.FrameBytes ||
        r.getLong(3) < Multimodal.FrameBytes && offs.forall(_ == 0)))
      // mean byte of printable text sits in the printable band
      assert(fs.forall(r => r.getDouble(5) > 30 && r.getDouble(5) < 200))
    }
  }

  /** Write the events table as `nFiles` single-file parquets under a
    * flat dir, rows assigned by `filePart`, in file order 0..n-1 (the
    * file stream + maxFilesPerTrigger=1 then replays them as separate
    * micro-batches in that order). */
  private def writeEventFiles(dir: String, nFiles: Int,
      filePart: org.apache.spark.sql.Column): Unit = {
    val ev = Tables.events(spark, sf).withColumn("_p", filePart)
    (0 until nFiles).foreach { i =>
      val tmp = s"$dir/_t$i"
      ev.filter(col("_p") === i).drop("_p")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.move(part, java.nio.file.Paths.get(f"$dir/f$i%02d.parquet"))
    }
  }

  private def streamedFunnelCounts(dir: String, delay: String,
      sink: String): Map[Int, Long] = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props",
        org.apache.spark.sql.types.StringType)))
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = Streaming.funnelStreamEventTime(src, delay)
      .toDF.writeStream.outputMode("update")
      .format("memory").queryName(sink).start()
    q.processAllAvailable(); q.stop()
    // provisional stages are monotone in the event set → max is final
    spark.table(sink)
      .groupBy("user_id").agg(org.apache.spark.sql.functions.max("stage").as("stage"))
      .collect().map(_.getInt(1)).groupBy(identity)
      .map { case (s, xs) => s -> xs.length.toLong }
  }

  test("event-time funnel: exact batch parity under fully shuffled arrival") {
    // events scattered across 5 micro-batches by hash — maximal
    // cross-batch lateness; the large watermark delay keeps every
    // event inside the pending window, so re-sorting must reconstruct
    // exact event-time semantics (this input breaks the arrival-order
    // funnelStream by construction)
    val dir = java.nio.file.Files.createTempDirectory("graft-wmfunnel").toString
    writeEventFiles(dir, 5,
      pmod(graft.text.TextFunctions.hash64(col("event_id").cast("string")), lit(5)))
    val stages = streamedFunnelCounts(dir, "90 days", "wmfunnel_shuffled")
    val batch = graft.analytics.Queries.eventsFunnel(spark, sf)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    def atLeast(s: Int) = stages.collect { case (st, n) if st >= s => n }.sum
    assert(atLeast(1) == batch("view"), s"stages=$stages batch=$batch")
    assert(atLeast(2) == batch("click"))
    assert(atLeast(3) == batch("purchase"))
  }

  test("event-time funnel: drain path (bounded state) keeps batch parity") {
    // files are time-ordered quintiles (shuffled inside each), delay
    // shorter than the span — the watermark advances between batches
    // and the pre-watermark prefix folds into the three set-once longs
    // (state actually drains) while parity must hold
    val dir = java.nio.file.Files.createTempDirectory("graft-wmfunnel2").toString
    writeEventFiles(dir, 5, ntile(5).over(
      org.apache.spark.sql.expressions.Window.orderBy("ts")) - 1)
    val stages = streamedFunnelCounts(dir, "2 days", "wmfunnel_drained")
    val batch = graft.analytics.Queries.eventsFunnel(spark, sf)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    def atLeast(s: Int) = stages.collect { case (st, n) if st >= s => n }.sum
    assert(atLeast(1) == batch("view"), s"stages=$stages batch=$batch")
    assert(atLeast(2) == batch("click"))
    assert(atLeast(3) == batch("purchase"))
  }

  test("streaming day registers: bit-identical to batch; merged rollup = rolling_hll_users") {
    import graft.functions.HllSketch.{M, ScalePow}
    val dir = java.nio.file.Files.createTempDirectory("graft-dayreg").toString
    writeEventFiles(dir, 4,
      pmod(graft.text.TextFunctions.hash64(col("event_id").cast("string")), lit(4)))
    val src = spark.readStream.schema(Tables.events(spark, sf).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = Streaming.dayRegistersStream(src)
      .writeStream.outputMode("complete")
      .format("memory").queryName("dayreg_stream").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("dayreg_stream").collect()
      .map(r => r.getDate(0).toLocalDate -> r.getSeq[Int](1).toArray).toMap
    // 1) state is one register row per day, bit-identical to batch
    val batch = Streaming.dayRegistersStream(Tables.events(spark, sf))
      .collect()
      .map(r => r.getDate(0).toLocalDate -> r.getSeq[Int](1).toArray).toMap
    assert(got.keySet === batch.keySet)
    got.foreach { case (d, regs) =>
      assert(regs.sameElements(batch(d)), s"registers for $d") }
    // 2) max-merging the streamed per-day state reproduces the batch
    // trailing-window estimates of rolling_hll_users EXACTLY
    def estimate(regs: Array[Int]): Double = {
      val present = regs.count(_ > 0)
      val ssum = regs.filter(_ > 0)
        .map(r => 1L << (ScalePow - r)).sum + (M.toLong - present) * (1L << ScalePow)
      val zeros = M - present
      val eRaw = (0.7213 / (1.0 + 1.079 / M.toDouble)) * M.toDouble *
        M.toDouble * (1L << ScalePow).toDouble / ssum.toDouble
      val e = if (eRaw <= 2.5 * M && zeros > 0)
        M.toDouble * math.log(M.toDouble / zeros) else eRaw
      BigDecimal(e).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = graft.analytics.Mining.rollingHllUsers(spark, sf)
      .collect().map(r =>
        r.getTimestamp(0).toLocalDateTime.toLocalDate -> r.getDouble(2)).toMap
    expected.foreach { case (d, wau) =>
      val win = (0 to 6).map(k => d.minusDays(k)).flatMap(got.get)
      val merged = win.reduce((a, b) => a.zip(b).map(p => math.max(p._1, p._2)))
      assert(math.abs(estimate(merged) - wau) < 1e-9,
        s"day $d: merged-stream estimate vs rolling_hll_users")
    }
  }

  test("streaming HLL distinct: bit-identical to the batch twin under any batching") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hll").toString
    writeEventFiles(dir, 4,
      pmod(graft.text.TextFunctions.hash64(col("event_id").cast("string")), lit(4)))
    val src = spark.readStream.schema(Tables.events(spark, sf).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = Streaming.distinctUsersStream(src)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hll_stream").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("hll_stream").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // max-merge is associative+commutative: the 4-batch hash-scattered
    // arrival must produce EXACTLY the batch twin's registers/estimate
    val batch = Streaming.distinctUsersStream(Tables.events(spark, sf))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === batch)
    // and the estimate is a real estimate: ~1.6% HLL error at p=12
    val exact = Tables.events(spark, sf).select("event_type", "user_id")
      .distinct().groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((et, n) <- exact)
      assert(math.abs(got(et) - n) / n < 0.05, s"$et: est=${got(et)} exact=$n")
  }

  test("streaming top-k: SpaceSaving guarantee holds under micro-batched arrival") {
    val cap = 16
    val dir = java.nio.file.Files.createTempDirectory("graft-topk").toString
    writeEventFiles(dir, 4,
      pmod(graft.text.TextFunctions.hash64(col("event_id").cast("string")), lit(4)))
    val src = spark.readStream.schema(Tables.events(spark, sf).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = Streaming.topkItemsStream(src, cap)
      .writeStream.outputMode("complete")
      .format("memory").queryName("topk_stream").start()
    q.processAllAvailable(); q.stop()
    val cands = spark.table("topk_stream").collect()
      .head.getSeq[String](0).toSet
    assert(cands.size <= cap, "sketch state must stay bounded")
    // the SpaceSaving guarantee: every item with true count > N/cap is
    // in the candidate set, regardless of batch boundaries/merge order
    val exact = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select(get_json_object(col("props"), "$.k").as("item"))
      .groupBy("item").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val mustHave = exact.filter(_._2 > n / cap).keySet
    assert(mustHave.subsetOf(cands),
      s"missing guaranteed heavy hitters: ${mustHave -- cands}")
    // and the fixture is non-trivial: more items than sketch capacity
    assert(exact.size > cap, s"fixture degenerate: ${exact.size} items")
  }

  test("streaming KLL quantiles: rank guarantee holds under micro-batched arrival") {
    val dir = java.nio.file.Files.createTempDirectory("graft-kllq").toString
    writeEventFiles(dir, 4,
      pmod(graft.text.TextFunctions.hash64(col("event_id").cast("string")), lit(4)))
    val src = spark.readStream.schema(Tables.events(spark, sf).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = Streaming.quantilesStream(src)
      .writeStream.outputMode("complete")
      .format("memory").queryName("kll_stream").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("kll_stream").collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val byType = Tables.events(spark, sf).select("event_type", "value")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(got.keySet === byType.keySet)
    // KLL with k=200 at this n: generous ±2.5% rank tolerance
    for ((et, xs) <- byType; (qt, i) <- Seq(0.5, 0.9, 0.99).zipWithIndex) {
      val est = got(et)(i)
      val rank = xs.count(_ <= est).toDouble / xs.length
      assert(math.abs(rank - qt) <= 0.025 + 1.0 / xs.length,
        s"$et q$qt: est=$est realized rank=$rank")
    }
  }
}
