package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming builders (SURVEY.md §2.7). Each transform is a
  * plain DataFrame function so the SAME plan runs in batch mode (for
  * the DuckDB oracle) and behind `readStream` (StreamingSpec drives it
  * with a watermark and asserts parity).
  */
object EventStream {

  /** Tumbling-window counts/sums per event type. In streaming mode the
    * caller adds `withWatermark("ts", ...)` before this; state is then
    * bounded by watermark horizon × event types.
    */
  def windowCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(
        unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window counts/sums per event type (2 h windows sliding
    * every 1 h — each event contributes to width/slide windows). Same
    * batch/stream duality as [[windowCounts]].
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(
        unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"), col("sum_value"))

  /** Hourly OHLC bars per event type — the streaming dual of the
    * `ts_resample_ohlc` gate: open/close via `min_by`/`max_by` on the
    * stream's unique sequence number, high/low/volume alongside, all
    * in ONE declarative aggregate, so the same plan runs over a
    * watermarked stream (state = one bar per open window × type) and
    * over a batch DataFrame. Works because every piece is a
    * DeclarativeAggregate — no rank, no second pass.
    */
  def ohlcBars(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        min_by(col("value"), col("event_id")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("event_id")).as("close"),
        round(sum(col("value")), 4).as("volume"),
        count(lit(1)).as("n_events"))
      .select(
        unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("open"), col("high"), col("low"),
        col("close"), col("volume"), col("n_events"))

  /** OHLC bars in EXACT integer cents — the replay-gate face of
    * [[ohlcBars]]: a streaming aggregation folds each window's rows in
    * arrival order while the batch plan folds in scan order, so a
    * double `sum(value)` can differ in final ulps between the two and
    * flip a `round(..., 4)` at a boundary. Quantizing to cents BEFORE
    * the sum (the spendTracker discipline — values are nonnegative,
    * where Spark's HALF_UP and DuckDB's half-away-from-zero agree)
    * makes every aggregate an exact long whatever the fold order,
    * which is what lets the streamed bars hash-match the batch oracle.
    * open/close ride (cents, event_id) min_by/max_by — exact, ids
    * unique.
    */
  def ohlcBarsCents(events: DataFrame): DataFrame =
    events
      .withColumn("cents", expr("CAST(round(value * 100, 0) AS BIGINT)"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        min_by(col("cents"), col("event_id")).as("open_cents"),
        max(col("cents")).as("high_cents"),
        min(col("cents")).as("low_cents"),
        max_by(col("cents"), col("event_id")).as("close_cents"),
        sum(col("cents")).as("volume_cents"),
        count(lit(1)).as("n_events"))
      .select(
        unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("open_cents"), col("high_cents"),
        col("low_cents"), col("close_cents"), col("volume_cents"),
        col("n_events"))

  /** Top event type per finalized window — the rank-over-windowed-
    * counts shape. Rank functions don't run inside a streaming
    * aggregation, so in production this is the `foreachBatch` step
    * over [[windowCounts]]' finalized output (each batch holds only
    * windows the watermark just closed — tiny); in batch mode it is
    * the same plan end to end, which is what the gate oracles.
    * Deterministic tie-break: (count desc, event_type).
    */
  def topEventPerWindow(events: DataFrame): DataFrame =
    rankTopPerWindow(windowCounts(events))

  /** The rank step itself — shared verbatim by the batch gate above
    * and the per-micro-batch `foreachBatch` body below, so what the
    * oracle checks IS what production executes.
    */
  private def rankTopPerWindow(counts: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window_start_us"))
      .orderBy(col("n").desc, col("event_type"))
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("window_start_us"), col("event_type"), col("n"))
  }

  /** The idempotent per-batch write: rank the finalized windows this
    * micro-batch emitted, then dynamic-partition-OVERWRITE their
    * window directories. A replayed batch (failure/restart re-runs
    * the same epoch) rewrites the same partitions with the same
    * deterministic content — exactly-once output without a
    * transactional sink. Exposed for direct spec-level replay tests.
    */
  def writeTopEventBatch(finalizedCounts: DataFrame, outDir: String): Unit =
    rankTopPerWindow(finalizedCounts)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("window_start_us")
      .parquet(outDir)

  /** Production wiring end to end: watermarked stream → append-mode
    * windowed counts (only watermark-finalized windows reach each
    * micro-batch) → `foreachBatch` ranking + idempotent partitioned
    * write. Caller supplies the watermarked stream (`withWatermark`
    * on `ts`) and owns the returned query's lifecycle. At 100 TB
    * this is the deploy shape: bounded state (watermark horizon ×
    * event types), tiny per-batch rank input, restart-safe sink.
    */
  def startTopEventSink(watermarked: DataFrame, outDir: String,
                        checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    windowCounts(watermarked)
      .writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch((batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        writeTopEventBatch(batch.toDF(), outDir))
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Stream-stream interval join: purchases attributed to a click by
    * the same user within the following hour. The event-time bound is
    * what lets Spark expire join state in streaming mode (callers add
    * `withWatermark` on each side's `ts` first); the SAME plan runs
    * in batch for the DuckDB oracle gate (`q_interval_join`), and
    * StreamingSpec asserts the stream side agrees.
    *
    * Both inputs: (user_id, ts, event_id[, value]).
    */
  def intervalJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.select(col("user_id"), col("ts").as("c_ts"),
      col("event_id").as("click_id"))
    val p = purchases.select(col("user_id").as("p_user"), col("ts").as("p_ts"),
      col("event_id").as("purchase_id"), col("value"))
    c.join(p, expr("user_id = p_user AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 1 HOUR"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        unix_micros(col("c_ts")).as("c_us"), unix_micros(col("p_ts")).as("p_us"),
        round(col("value"), 4).as("purchase_value"))
  }

  /** LEFT OUTER stream-stream interval join: every click emits —
    * matched within the hour, or with null purchase columns once the
    * watermark passes `c_ts + 1 hour` (the event-time bound is what
    * lets Spark PROVE no future purchase can still match, emit the
    * null row, and drop the click's join state; without it an outer
    * stream join would hold every click forever). The same plan runs
    * in batch, where the nulls are immediate — StreamingSpec pins
    * stream/batch agreement including the null rows.
    */
  def intervalJoinOuter(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.select(col("user_id"), col("ts").as("c_ts"),
      col("event_id").as("click_id"))
    val p = purchases.select(col("user_id").as("p_user"), col("ts").as("p_ts"),
      col("event_id").as("purchase_id"), col("value"))
    c.join(p,
        expr("user_id = p_user AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 1 HOUR"),
        "left_outer")
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        unix_micros(col("c_ts")).as("c_us"),
        round(col("value"), 4).as("purchase_value"))
  }

  /** Streaming exactly-once dedup for an at-least-once transport:
    * keep the FIRST arrival of each `event_id`, drop any redelivery
    * that lands within the watermark delay of the original
    * (`dropDuplicatesWithinWatermark` — state per key is evicted once
    * the watermark passes its event time + delay, so the dedup map is
    * bounded by the delay window, not the stream's lifetime — the
    * property that makes a 100 TB/day Kafka intake dedup feasible).
    * Callers add `withWatermark` on `ts` first; the batch twin of
    * this plan is plain DISTINCT, which is what the replay gate's
    * oracle states.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events.dropDuplicatesWithinWatermark("event_id")

  final case class ValEv(user_id: Long, event_id: Long, value: Double)
  final case class EwmaState(ewma: Double, n: Long)
  final case class EwmaOut(user_id: Long, n_events: Long, ewma: Double)

  /** Stateful streaming EWMA — the streaming face of the `ts_ewma`
    * gate: per-key state is ONE (double, count) pair however long the
    * stream runs (the recurrence's whole point — contrast with
    * windowed aggregates whose state scales with open windows). Each
    * micro-batch folds its events in sequence order (events within a
    * batch sort by `event_id`; cross-batch order is the stream's
    * arrival order, as in the batch gate) and emits the updated value
    * per key seen. Same fold arithmetic as the batch gate
    * (s₀ = x₀, s = (1−α)·s + α·x), so a drained stream equals the
    * batch fold exactly — StreamingSpec pins it.
    */
  def ewma(ds: Dataset[ValEv], alpha: Double): Dataset[EwmaOut] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val decay = 1.0 - alpha
    ds.groupByKey(_.user_id)
      .mapGroupsWithState[EwmaState, EwmaOut](GroupStateTimeout.NoTimeout) {
        (userId: Long, events: Iterator[ValEv], state: GroupState[EwmaState]) =>
          val sorted = events.toSeq.sortBy(_.event_id)
          var (s, n) = state.getOption.map(a => (a.ewma, a.n)).getOrElse((0.0, 0L))
          sorted.foreach { e =>
            s = if (n == 0) e.value else s * decay + alpha * e.value
            n += 1
          }
          state.update(EwmaState(s, n))
          EwmaOut(userId, n, s)
      }
  }

  final case class Ev(user_id: Long, ts_us: Long, event_id: Long)
  final case class SessionAcc(start_us: Long, last_us: Long, n: Long)
  final case class SessionOut(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  /** Stateful streaming sessionizer: closes a session when a new event
    * arrives more than `gapUs` after the last one, AND flushes idle
    * sessions via an event-time timeout once the watermark passes
    * `last + gap` — so a user who disappears still gets their open
    * session emitted and their state removed (without the TTL, state
    * for every idle key would accumulate forever at 100 TB). Streaming
    * callers must set `withWatermark` on the event-time column before
    * this; in batch mode timeouts are inert and the final open
    * sessions simply stay in (dropped) state, same as before.
    */
  def sessionize(ds: Dataset[Ev], gapUs: Long): Dataset[SessionOut] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, events: Iterator[Ev], state: GroupState[SessionAcc]) =>
          if (state.hasTimedOut) {
            // idle past the gap: flush the open accumulator
            val acc = state.get
            state.remove()
            Iterator.single(SessionOut(userId, acc.start_us, acc.last_us, acc.n))
          } else {
            val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
            var acc = state.getOption.orNull
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            sorted.foreach { e =>
              if (acc == null) acc = SessionAcc(e.ts_us, e.ts_us, 1)
              else if (e.ts_us - acc.last_us > gapUs) {
                closed += SessionOut(userId, acc.start_us, acc.last_us, acc.n)
                acc = SessionAcc(e.ts_us, e.ts_us, 1)
              } else acc = SessionAcc(acc.start_us, e.ts_us, acc.n + 1)
            }
            if (acc != null) {
              state.update(acc)
              // fire once the watermark passes the session gap; clamp
              // above the current watermark so late keys can't throw.
              // Batch mode strips the watermark node entirely and
              // getCurrentWatermarkMs throws — timeouts are inert
              // there, so skip scheduling one.
              val watermark =
                try Some(state.getCurrentWatermarkMs)
                catch { case _: UnsupportedOperationException => None }
              watermark.foreach { wm =>
                val target = acc.last_us / 1000 + gapUs / 1000
                state.setTimeoutTimestamp(math.max(target, wm + 1))
              }
            }
            closed.iterator
          }
      }
  }

  final case class SpendState(n: Long, total_cents: Long, max_cents: Long)
  final case class SpendOut(user_id: Long, n: Long, total_cents: Long, max_cents: Long)

  /** Per-user spend tracker through Spark 4's `transformWithState` —
    * the arbitrary-state API that supersedes `mapGroupsWithState`
    * (typed state handles with per-state TTL, timers, and RocksDB
    * state-store backing; set
    * `spark.sql.streaming.stateStore.providerClass` to the RocksDB
    * provider before starting the query). State per key is one
    * (count, total, max) triple of exact integer cents forever —
    * constant per user regardless of stream length. Events fold in
    * `event_id` order within a batch (the ewma discipline), so a
    * drained stream equals a driver-side fold exactly — StreamingSpec
    * pins it across micro-batches.
    */
  class SpendProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, ValEv, SpendOut] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[SpendState] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[SpendState]("spend",
        org.apache.spark.sql.Encoders.product[SpendState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[ValEv],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[SpendOut] = {
      var s = Option(st.get()).getOrElse(SpendState(0L, 0L, 0L))
      rows.toSeq.sortBy(_.event_id).foreach { e =>
        val cents = math.round(e.value * 100)
        s = SpendState(s.n + 1, s.total_cents + cents, math.max(s.max_cents, cents))
      }
      st.update(s)
      Iterator.single(SpendOut(key, s.n, s.total_cents, s.max_cents))
    }
  }

  def spendTracker(ds: Dataset[ValEv]): Dataset[SpendOut] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.user_id)
      .transformWithState(new SpendProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  final case class CdcEv(key: Long, status: String, cents: Long,
                         version: Long, op: String)

  /** Streaming CDC upsert through `transformWithState`: per-key state
    * is the single latest-version row (LAST-WRITER-WINS on version,
    * ties impossible by construction — each key appears at most once
    * per version tier), so state is one row per live key forever —
    * the Delta/Iceberg MERGE contract as a stream. Update-mode
    * emissions are the key's current materialized row; because
    * `version` is monotone per key, the final table equals the
    * max-version emission per key whatever the batch split — which is
    * exactly what the batch `etl_cdc_apply` oracle computes (the
    * replay gate is hash-checked against the IDENTICAL oracle SQL —
    * the dedup_incremental_bloom convention: one oracle, two plans).
    */
  class CdcProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, CdcEv, CdcEv] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[CdcEv] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[CdcEv]("cdc",
        org.apache.spark.sql.Encoders.product[CdcEv],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[CdcEv],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[CdcEv] = {
      var cur = st.get()
      rows.foreach { r =>
        if (cur == null || r.version > cur.version) cur = r
      }
      st.update(cur)
      Iterator.single(cur)
    }
  }

  def cdcApplyStream(ds: Dataset[CdcEv]): Dataset[CdcEv] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key)
      .transformWithState(new CdcProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }
}
