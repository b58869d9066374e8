package graft

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class StreamingSpec extends GraftSuite {
  import spark.implicits._

  test("windowCounts through readStream+watermark matches the batch plan") {
    val batch = EventStream.windowCounts(Tables(spark, sf0001).events)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    // file-source streaming over the same parquet (micros ts arrives as timestamp)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // the streaming file source needs a directory; stage the single file
    val stageDir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      stageDir.resolve("events.parquet"))
    val stream = spark.readStream.schema(schema)
      .parquet(stageDir.toString)
      .withWatermark("ts", "10 minutes")
    val q = EventStream.windowCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_counts").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("win_counts")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("native session_window through readStream+watermark matches the batch plan") {
    import org.apache.spark.sql.functions.{session_window => sw}
    def sessions(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("user_id"), sw(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("v"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("s"),
          unix_micros(col("session_window.end")).as("e"),
          col("n"), col("v"))
    val batch = sessions(Tables(spark, sf0001).events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val stageDir = java.nio.file.Files.createTempDirectory("graft_stream_sess")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      stageDir.resolve("events.parquet"))
    val stream = spark.readStream.schema(schema)
      .parquet(stageDir.toString)
      .withWatermark("ts", "1 hour")
    val q = sessions(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("native_sessions").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("native_sessions")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("OHLC bars through readStream+watermark match the batch plan") {
    // min_by/max_by are declarative aggregates, so the identical OHLC
    // plan runs streaming (one bar of state per open window × type)
    val batch = EventStream.ohlcBars(Tables(spark, sf0001).events)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val stageDir = java.nio.file.Files.createTempDirectory("graft_stream_ohlc")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      stageDir.resolve("events.parquet"))
    val stream = spark.readStream.schema(schema)
      .parquet(stageDir.toString)
      .withWatermark("ts", "10 minutes")
    val q = EventStream.ohlcBars(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("ohlc_bars").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ohlc_bars")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("topEventPerWindow over the streamed counts matches the batch plan") {
    // the documented composition: windowed counts run IN the stream,
    // the rank step runs over each finalized batch (foreachBatch) —
    // here over the complete-mode table, which holds the same rows
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val stageDir = java.nio.file.Files.createTempDirectory("graft_stream_top")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      stageDir.resolve("events.parquet"))
    val stream = spark.readStream.schema(schema)
      .parquet(stageDir.toString)
      .withWatermark("ts", "10 minutes")
    val q = EventStream.windowCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_counts_top").start()
    try {
      q.processAllAvailable()
      val counts = spark.table("win_counts_top")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"window_start_us").orderBy($"n".desc, $"event_type")
      val streamed = counts.withColumn("rk", row_number().over(w))
        .filter($"rk" === 1).select($"window_start_us", $"event_type", $"n")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val batch = EventStream.topEventPerWindow(Tables(spark, sf0001).events)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("foreachBatch sink writes finalized-window top events idempotently end to end") {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val stageDir = java.nio.file.Files.createTempDirectory("graft_fb_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      stageDir.resolve("events.parquet"))
    val outDir = java.nio.file.Files.createTempDirectory("graft_fb_out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft_fb_ck").toString
    val stream = spark.readStream.schema(schema)
      .parquet(stageDir.toString)
      .withWatermark("ts", "10 minutes")
    val q = EventStream.startTopEventSink(stream, outDir, ckDir)
    try q.processAllAvailable() finally q.stop()

    val batchTop = EventStream.topEventPerWindow(Tables(spark, sf0001).events)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    def readOut() = spark.read.parquet(outDir)
      .select($"window_start_us".cast("long"), $"event_type", $"n")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val out = readOut()
    assert(out.nonEmpty, "append mode must emit watermark-finalized windows")
    // every emitted window carries exactly the batch gate's answer
    out.foreach { case (win, v) =>
      assert(batchTop(win) == v, s"window $win: sink wrote $v, batch says ${batchTop(win)}")
    }
    // coverage: each window safely below the final watermark emitted
    val maxTsUs = Tables(spark, sf0001).events
      .agg(max(unix_micros($"ts"))).collect().head.getLong(0)
    val wmUs = maxTsUs - 600L * 1000000
    val mustEmit = batchTop.keySet.filter(_ + 3600L * 1000000 < wmUs)
    assert(mustEmit.subsetOf(out.keySet),
      s"windows finalized below the watermark missing: ${mustEmit -- out.keySet}")
    // idempotency: replaying the batch write over the same finalized
    // counts (a restart re-runs the epoch) must leave the sink
    // byte-identical — dynamic overwrite rewrites the same partitions
    val finalized = EventStream.windowCounts(Tables(spark, sf0001).events)
      .filter(($"window_start_us" + 3600L * 1000000) < wmUs)
    EventStream.writeTopEventBatch(finalized, outDir)
    val replayedOnce = readOut()
    EventStream.writeTopEventBatch(finalized, outDir)
    assert(readOut() == replayedOnce, "replay must be a no-op on sink content")
    replayedOnce.foreach { case (win, v) => assert(batchTop(win) == v) }
  }

  test("foreachBatch incremental aggregate maintenance equals the full recompute") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)] // (priority, cents)
    val stateDir = java.nio.file.Files.createTempDirectory("graft_ivm_state").toString
    def readState() =
      try spark.read.parquet(stateDir)
      catch { case _: Throwable =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("prio", StringType),
            StructField("n", LongType), StructField("cents", LongType))))
      }
    val q = input.toDF().toDF("prio", "cents")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val delta = batch.groupBy(col("prio"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
        val merged = graft.streaming.IncrementalAgg
          .merge(readState(), delta, Seq("prio"), Seq("n", "cents"))
          .collect() // materialize before overwriting what it reads
        spark.createDataFrame(spark.sparkContext.parallelize(merged.toSeq),
            readState().schema)
          .write.mode("overwrite").parquet(stateDir)
        ()
      }
      .start()
    val all = Seq(
      Seq(("HIGH", 100L), ("LOW", 10L), ("HIGH", 50L)),
      Seq(("LOW", 20L), ("MED", 7L)),
      Seq(("HIGH", 1L), ("MED", 3L), ("LOW", 30L)))
    try {
      all.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val got = readState().collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val direct = all.flatten.groupBy(_._1).map { case (k, vs) =>
      k -> ((vs.size.toLong, vs.map(_._2).sum)) }
    assert(got === direct)
  }

  test("stream-static join enriches the stream with a broadcast dim") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Double)] // (user_id, value)
    val dim = Tables(spark, sf0001).customer
      .select($"c_custkey", $"c_mktsegment")
    val enriched = input.toDS().toDF("user_id", "value")
      .join(org.apache.spark.sql.functions.broadcast(dim),
        $"user_id" === $"c_custkey")
      .select($"user_id", $"c_mktsegment", $"value")
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("enriched").start()
    try {
      input.addData((1L, 5.0), (2L, 7.0))
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
      assert(rows.length == 2 && rows.forall(!_.isNullAt(1)))
    } finally q.stop()
  }

  test("stateful sessionizer closes sessions across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.Ev]
    val watermarked = input.toDS()
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
      .withWatermark("ts", "0 seconds")
      .as[EventStream.Ev]
    val q = EventStream.sessionize(watermarked, gapUs = 1000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    try {
      // batch 1: two events in one session, then a gap event (times
      // sit above t=0 so the initial watermark can't drop them as late)
      input.addData(EventStream.Ev(1L, 1_000_000L, 1L), EventStream.Ev(1L, 1_000_500L, 2L))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0) // session still open
      // batch 2: event far after -> closes first session
      input.addData(EventStream.Ev(1L, 1_010_000L, 3L))
      q.processAllAvailable()
      val closed = spark.table("sessions").as[EventStream.SessionOut].collect()
      assert(closed.toSeq == Seq(EventStream.SessionOut(1L, 1_000_000L, 1_000_500L, 2L)))
    } finally q.stop()
  }

  test("stateful EWMA across micro-batches equals the batch fold") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventStream.ValEv]
    val q = EventStream.ewma(input.toDS(), alpha = 0.25)
      .writeStream.outputMode("update")
      .format("memory").queryName("ewma_out").start()
    try {
      // key 1 split across batches (and delivered out of order inside
      // batch 1 — the per-batch event_id sort must fix it); key 2 in one
      input.addData(
        EventStream.ValEv(1L, 2L, 4.0), EventStream.ValEv(1L, 1L, 8.0),
        EventStream.ValEv(2L, 3L, 5.0))
      q.processAllAvailable()
      input.addData(EventStream.ValEv(1L, 4L, 12.0))
      q.processAllAvailable()
      // final state per key = last update emitted
      val got = spark.table("ewma_out").as[EventStream.EwmaOut].collect()
        .groupBy(_.user_id)
        .map { case (k, rows) => k -> rows.maxBy(_.n_events) }
      // batch-fold ground truth: s=8 → .75*8+.25*4=7 → .75*7+.25*12=8.25
      assert(got(1L) == EventStream.EwmaOut(1L, 3L, 8.25))
      assert(got(2L) == EventStream.EwmaOut(2L, 1L, 5.0))
      // and the same numbers through the BATCH gate's fold arithmetic
      val batch = Seq((1L, 1L, 8.0), (1L, 2L, 4.0), (1L, 4L, 12.0), (2L, 3L, 5.0))
        .toDF("user_id", "event_id", "value")
        .groupBy($"user_id")
        .agg(sort_array(collect_list(struct($"event_id", $"value"))).as("seq"))
        .withColumn("vals", expr("transform(seq, x -> x.value)"))
        .select($"user_id", expr(
          "aggregate(slice(vals, 2, size(vals) - 1), element_at(vals, 1)," +
            " (acc, x) -> acc * 0.75 + 0.25 * x)").as("ewma"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(batch(1L) == got(1L).ewma && batch(2L) == got(2L).ewma)
    } finally q.stop()
  }

  test("sliding-window counts through readStream match the batch plan") {
    val batch = EventStream.slidingCounts(Tables(spark, sf0001).events)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val stageDir = java.nio.file.Files.createTempDirectory("graft_stream_slide")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      stageDir.resolve("events.parquet"))
    val stream = spark.readStream.schema(schema)
      .parquet(stageDir.toString)
      .withWatermark("ts", "10 minutes")
    val q = EventStream.slidingCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("slide_counts").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("slide_counts")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("stream-stream interval join matches events within the time bound") {
    implicit val sqlCtx = spark.sqlContext
    // the SAME builder the q_interval_join batch gate runs — the
    // event-time bound is what lets Spark expire join state
    val clicks = MemoryStream[(Long, Long, Long)]  // (user_id, ts_us, event_id)
    val buys = MemoryStream[(Long, Long, Long, Double)]
    val cdf = clicks.toDS().toDF("user_id", "ts_us", "event_id")
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
      .withWatermark("ts", "0 seconds")
    val bdf = buys.toDS().toDF("user_id", "ts_us", "event_id", "value")
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
      .withWatermark("ts", "0 seconds")
    val joined = graft.streaming.EventStream.intervalJoin(cdf, bdf)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attrib").start()
    try {
      clicks.addData((1L, 3_600_000_000L, 101L), (2L, 3_600_000_000L, 102L))
      buys.addData((1L, 5_400_000_000L, 201L, 9.5))  // 30 min later -> attributed
      buys.addData((2L, 9_000_000_000L, 202L, 1.0))  // 90 min later -> outside bound
      q.processAllAvailable()
      val rows = spark.table("attrib").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5))).toSet
      assert(rows == Set((1L, 101L, 201L, 9.5)), rows.toString)
    } finally q.stop()
  }

  test("LEFT OUTER interval join emits null rows once the watermark passes the bound") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Long)]
    val buys = MemoryStream[(Long, Long, Long, Double)]
    val cdf = clicks.toDS().toDF("user_id", "ts_us", "event_id")
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
      .withWatermark("ts", "0 seconds")
    val bdf = buys.toDS().toDF("user_id", "ts_us", "event_id", "value")
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
      .withWatermark("ts", "0 seconds")
    val q = graft.streaming.EventStream.intervalJoinOuter(cdf, bdf)
      .writeStream.outputMode("append").format("memory").queryName("attrib_outer").start()
    try {
      clicks.addData((1L, 3_600_000_000L, 101L), (2L, 3_600_000_000L, 102L))
      buys.addData((1L, 5_400_000_000L, 201L, 9.5)) // user 1 attributed
      q.processAllAvailable()
      // push the GLOBAL watermark (min across both sources) past
      // c_ts + 1 hour so user 2's click is provably unmatched
      clicks.addData((9L, 14_400_000_000L, 999L))
      buys.addData((9L, 14_400_000_000L, 998L, 0.0))
      q.processAllAvailable()
      val rows = spark.table("attrib_outer").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      assert(rows.contains((1L, 101L, 201L)), rows.toString)
      assert(rows.contains((2L, 102L, -1L)), s"unmatched click did not emit: $rows")
      // batch face of the same builder agrees, nulls included
      val cb = Seq((1L, 3_600_000_000L, 101L), (2L, 3_600_000_000L, 102L))
        .toDF("user_id", "ts_us", "event_id").withColumn("ts", expr("timestamp_micros(ts_us)"))
      val bb = Seq((1L, 5_400_000_000L, 201L, 9.5))
        .toDF("user_id", "ts_us", "event_id", "value").withColumn("ts", expr("timestamp_micros(ts_us)"))
      val batch = graft.streaming.EventStream.intervalJoinOuter(cb, bb).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      assert(batch == Set((1L, 101L, 201L), (2L, 102L, -1L)), batch.toString)
    } finally q.stop()
  }

  test("sessionize still runs in BATCH mode (timeouts inert, no watermark to read)") {
    // regression: the TTL change must not crash non-streaming callers —
    // getCurrentWatermarkMs throws in batch because the watermark node
    // is eliminated there
    val batch = Seq(
      EventStream.Ev(1L, 1_000_000L, 1L), EventStream.Ev(1L, 1_000_500L, 2L),
      EventStream.Ev(1L, 1_010_000L, 3L)).toDS()
    val closed = EventStream.sessionize(batch, gapUs = 1000L).collect()
    assert(closed.toSeq == Seq(EventStream.SessionOut(1L, 1_000_000L, 1_000_500L, 2L)))
  }

  test("idle sessions flush via the event-time TTL without another event from that user") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.Ev]
    val watermarked = input.toDS()
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
      .withWatermark("ts", "0 seconds")
      .as[EventStream.Ev]
    val q = EventStream.sessionize(watermarked, gapUs = 1000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("idle_sessions").start()
    try {
      // user 1 opens a session, then goes silent forever
      input.addData(EventStream.Ev(1L, 1_000_000L, 1L), EventStream.Ev(1L, 1_000_500L, 2L))
      q.processAllAvailable()
      assert(spark.table("idle_sessions").count() == 0)
      // OTHER traffic advances the watermark far past user 1's gap
      input.addData(EventStream.Ev(2L, 6_000_000L, 3L))
      q.processAllAvailable()
      // one more batch so the new watermark is applied to timeouts
      input.addData(EventStream.Ev(2L, 7_000_000L, 4L))
      q.processAllAvailable()
      val flushed = spark.table("idle_sessions").as[EventStream.SessionOut].collect()
        .filter(_.user_id == 1L)
      assert(flushed.toSeq == Seq(EventStream.SessionOut(1L, 1_000_000L, 1_000_500L, 2L)),
        s"idle session not flushed: ${flushed.toSeq}")
    } finally q.stop()
  }

  test("spend tracker restarts from checkpoint: state survives, no batch replays") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    withSQLConf(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      // changelog checkpointing: recovery replays the per-batch change
      // log instead of re-uploading full RocksDB snapshots — the
      // production recovery path, so prove state survival under it
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true") {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toFile
      ckpt.deleteOnExit()
      val input = MemoryStream[EventStream.ValEv]
      // the memory sink refuses checkpoint recovery by design; a
      // foreachBatch sink is the recoverable production shape
      val out = new java.util.concurrent.ConcurrentLinkedQueue[EventStream.SpendOut]()
      def start() = EventStream.spendTracker(input.toDS())
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[EventStream.SpendOut], _: Long) =>
          df.collect().foreach(out.add)
        }.start()
      val q1 = start()
      try {
        input.addData(
          EventStream.ValEv(1L, 2L, 4.5), EventStream.ValEv(1L, 1L, 8.25),
          EventStream.ValEv(2L, 3L, 5.0))
        q1.processAllAvailable()
        import scala.jdk.CollectionConverters._
        assert(out.asScala.filter(_.user_id == 1L).maxBy(_.n) ==
          EventStream.SpendOut(1L, 2L, 1275L, 825L))
      } finally q1.stop()
      // the first incarnation is dead; more data arrives while no query
      // runs, then a NEW incarnation resumes from the same checkpoint
      out.clear()
      input.addData(EventStream.ValEv(1L, 4L, 12.0))
      val q2 = start()
      try {
        q2.processAllAvailable()
        import scala.jdk.CollectionConverters._
        val out2 = out.asScala.toSeq
        // state SURVIVED the restart: user 1's fold continues from
        // (2, 1275, 825), not from zero
        assert(out2.count(_.user_id == 1L) == 1)
        assert(out2.find(_.user_id == 1L).get ==
          EventStream.SpendOut(1L, 3L, 2475L, 1200L))
        // exactly-once: the committed first batch did NOT replay — user
        // 2 saw no new events, so an update-mode re-emission of it
        // could only come from reprocessing batch 1
        assert(!out2.exists(_.user_id == 2L))
      } finally q2.stop()
    }
  }

  test("transformWithState spend tracker folds exact cents across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    withSQLConf("spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val input = MemoryStream[EventStream.ValEv]
      val q = EventStream.spendTracker(input.toDS())
        .writeStream.outputMode("update")
        .format("memory").queryName("spend_out").start()
      try {
        // key 1 split across batches, out of order inside batch 1
        input.addData(
          EventStream.ValEv(1L, 2L, 4.5), EventStream.ValEv(1L, 1L, 8.25),
          EventStream.ValEv(2L, 3L, 5.0))
        q.processAllAvailable()
        input.addData(EventStream.ValEv(1L, 4L, 12.0))
        q.processAllAvailable()
        val got = spark.table("spend_out").as[EventStream.SpendOut].collect()
          .groupBy(_.user_id).map { case (k, rows) => k -> rows.maxBy(_.n) }
        assert(got(1L) == EventStream.SpendOut(1L, 3L, 2475L, 1200L))
        assert(got(2L) == EventStream.SpendOut(2L, 1L, 500L, 500L))
      } finally q.stop()
    }
  }

  test("stream_interval_replay gate: true micro-batch replay equals the batch join") {
    val stream = graft.queries.SimilarityQ.streamIntervalReplay(spark, sf0001)
      .collect().map(_.toSeq.toList).toSet
    val batch = graft.queries.SimilarityQ.qIntervalJoin(spark, sf0001)
      .collect().map(_.toSeq.toList).toSet
    assert(stream === batch)
    assert(stream.nonEmpty)
  }

  test("stream_spend_replay gate: replayed transformWithState equals the batch aggregate") {
    import spark.implicits._
    val stream = graft.queries.SimilarityQ.streamSpendReplay(spark, sf0001)
      .collect().map(_.toSeq.toList).toSet
    val batch = Tables(spark, sf0001).events
      .filter($"event_type" === "purchase")
      .select($"user_id", expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"), sum($"cents").as("total_cents"), max($"cents").as("max_cents"))
      .collect().map(_.toSeq.toList).toSet
    assert(stream === batch)
    assert(stream.nonEmpty)
  }

  test("CDC upsert stream: last-writer-wins survives out-of-order batch delivery") {
    implicit val sqlCtx = spark.sqlContext
    withSQLConf("spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
    val input = MemoryStream[EventStream.CdcEv]
    val name = "cdc_ooo_" + java.util.UUID.randomUUID().toString.take(8)
    val q = EventStream.cdcApplyStream(input.toDS())
      .writeStream.outputMode("update").format("memory").queryName(name).start()
    try {
      // batch 1: key 1 at v2 arrives BEFORE its v1; key 2 base
      input.addData(
        EventStream.CdcEv(1L, "O", 500L, 2L, "U"),
        EventStream.CdcEv(2L, "F", 100L, 0L, "B"))
      q.processAllAvailable()
      // batch 2: the LATE v1 for key 1 must NOT overwrite v2; key 2
      // gets deleted; key 3 inserted
      input.addData(
        EventStream.CdcEv(1L, "O", 400L, 1L, "I"),
        EventStream.CdcEv(2L, "F", 0L, 3L, "D"),
        EventStream.CdcEv(3L, "P", 250L, 1L, "I"))
      q.processAllAvailable()
    } finally q.stop()
    val fin = spark.table(name)
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"key").orderBy($"version".desc)))
      .filter($"rk" === 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    spark.catalog.dropTempView(name)
    assert(fin(1L) == ((500L, 2L, "U")), s"late v1 must lose to v2: ${fin(1L)}")
    assert(fin(2L)._3 == "D", "delete must be the final state for key 2")
    assert(fin(3L) == ((250L, 1L, "I")))
    }
  }
}
