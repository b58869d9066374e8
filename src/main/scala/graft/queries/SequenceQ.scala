package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 wave 2 — event-sequence analytics over the `events`
  * stream: OHLC resampling, Markov transition mining, last-touch
  * attribution and robust winsorization. Every gate shares the
  * shape discipline of the earlier waves: one declared shuffle key
  * per query, windows ordered by `event_id` (the stream's unique
  * sequence number — deterministic on any engine), no broadcast
  * hints on unbounded relations.
  */
object SequenceQ {

  /** Hourly OHLC bars per event type — the downsampling primitive
    * behind every metrics/finance dashboard. Open/close are
    * `min_by`/`max_by` on the unique sequence number, so the whole
    * bar is ONE map-side-combinable aggregate: no window, no
    * self-join, a single shuffle on (type, hour). At 100 TB the
    * output is bounded by types × hours — aggregation, not data,
    * cardinality.
    */
  def tsResampleOhlc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).events
      .select($"event_type",
        expr("unix_micros(ts) div 3600000000").as("hour_bucket"),
        $"event_id", $"value")
      .groupBy($"event_type", $"hour_bucket")
      .agg(
        min_by($"value", $"event_id").as("open"),
        max($"value").as("high"),
        min($"value").as("low"),
        max_by($"value", $"event_id").as("close"),
        round(sum($"value"), 4).as("volume"),
        count(lit(1)).as("n_events"))
      .orderBy($"event_type", $"hour_bucket")
  }

  private val tsResampleOhlcSql =
    """SELECT event_type, epoch_us(ts) // 3600000000 AS hour_bucket,
      |  arg_min(value, event_id) AS open,
      |  max(value) AS high, min(value) AS low,
      |  arg_max(value, event_id) AS close,
      |  round(sum(value), 4) AS volume,
      |  count(*) AS n_events
      |FROM events GROUP BY 1, 2
      |ORDER BY event_type, hour_bucket""".stripMargin

  /** First-order Markov transition matrix of user behavior: for each
    * (state → next state) pair, its count and conditional
    * probability. The per-user sequence runs through ONE lag window
    * keyed on user_id (per-key state is a single previous row —
    * cheaper than sessionization), then two map-side-combinable
    * aggregates; the probability divides two exact integers, so both
    * engines produce the identical double. Output is |states|² —
    * constant-bounded however large the stream.
    */
  def qMarkovTransitions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
    val pairs = Tables(spark, dir).events
      .select($"user_id", $"event_id", $"event_type")
      .withColumn("src", lag($"event_type", 1).over(w))
      .filter($"src".isNotNull)
    val cnt = pairs.groupBy($"src", $"event_type".as("dst"))
      .agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy($"src").agg(sum($"n").as("n_src"))
    cnt.join(tot, "src")
      .select($"src", $"dst", $"n", round($"n" / $"n_src", 4).as("p"))
      .orderBy($"src", $"dst")
  }

  private val qMarkovTransitionsSql =
    """WITH pairs AS (
      |  SELECT user_id,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS src,
      |    event_type AS dst
      |  FROM events),
      |cnt AS (
      |  SELECT src, dst, count(*) AS n FROM pairs
      |  WHERE src IS NOT NULL GROUP BY src, dst),
      |tot AS (SELECT src, CAST(sum(n) AS BIGINT) AS n_src FROM cnt GROUP BY src)
      |SELECT c.src, c.dst, c.n, round(c.n / t.n_src, 4) AS p
      |FROM cnt c JOIN tot t USING (src)
      |ORDER BY c.src, c.dst""".stripMargin

  /** Markov removal-effect attribution (Anderl et al. 2014) — the
    * data-driven model that closes the attribution family (last-touch
    * `q_attribution`, Shapley `q_shapley_attribution`, transitions
    * `q_markov_transitions`): build the first-order journey chain
    * (START → channel⋯ → CONV on the first purchase / NULL if none),
    * then credit each channel by how much the chain's conversion
    * probability DROPS when that channel's edges are removed (mass
    * redirected to NULL — totals unrenormalized, the standard removal
    * semantics).
    *
    * Exactness: conversion probability is defined as K-STEP (K=24)
    * absorption — a Jacobi iteration in e12-scaled integers with
    * per-term `(cnt·x) div tot` division, identical in both engines
    * (integer sums are order-free; the only doubles are final exact
    * divisions, emitted UNROUNDED). The channel set is the pinned
    * event-type alphabet. Journey construction (the data-scale part —
    * one first-purchase aggregate + one lag window + one terminal
    * row per non-converting user) is fully distributed; the chain
    * solve collects the ≤42-row transition table as bounded driver
    * state (the centroid-fold precedent) — a 6-state matrix is
    * metadata whatever the corpus size.
    */
  def qMarkovAttribution(spark: SparkSession, dir: String): DataFrame =
    markovRemoval(
      Tables(spark, dir).events.select(
        org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("event_type")),
      Seq("click", "error", "signup", "view"))

  /** The removal-effect core over any (user_id, event_id, event_type)
    * stream and channel alphabet — split out so fixtures exercise the
    * REAL journey build and Jacobi solve (the chunkDedup convention).
    */
  def markovRemoval(events: DataFrame, channels: Seq[String]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val E12 = 1000000000000L
    val K = 24
    val e = events.select($"user_id", $"event_id", $"event_type")
    val fp = e.filter($"event_type" === "purchase")
      .groupBy($"user_id").agg(min($"event_id").as("pid"))
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
    val j = e.join(fp, Seq("user_id"), "left")
      .filter($"pid".isNull || $"event_id" <= $"pid")
      .withColumn("dst",
        when($"event_type" === "purchase", "conv").otherwise($"event_type"))
      .withColumn("prev", lag($"dst", 1).over(w))
    val tr0 = j.select(coalesce($"prev", lit("start")).as("src"), $"dst")
    val term = j
      .withColumn("mx", max($"event_id").over(Window.partitionBy($"user_id")))
      .filter($"pid".isNull && $"event_id" === $"mx")
      .select($"dst".as("src"), lit("null").as("dst"))
    val cnts = tr0.unionByName(term)
      .groupBy($"src", $"dst").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val states = "start" +: channels
    val dsts = channels ++ Seq("conv", "null")
    val tots = states.map(i => i -> dsts.map(d => cnts.getOrElse((i, d), 0L)).sum).toMap
    def absorb(removed: Option[String]): Long = {
      def cnt2(i: String, d: String): Long =
        if (removed.contains(i) || removed.contains(d)) 0L
        else cnts.getOrElse((i, d), 0L)
      var x = states.map(_ -> 0L).toMap
      for (_ <- 1 to K) {
        val prev = x
        x = states.map { i =>
          val t = tots(i)
          // the cnt·x product is widened (BigInt here, HUGEINT in the
          // oracle) before the floor division: in raw longs it
          // overflows once any per-edge count exceeds ~9.2e6
          // (ADVICE r13) — the quotient itself is ≤ E12 by
          // construction (x ≤ E12, Σcnt2 ≤ tot), so narrowing the
          // RESULT back is exact at any corpus size
          val v = if (removed.contains(i) || t == 0L) 0L
            else channels.map(d => (BigInt(cnt2(i, d)) * prev(d) / t).toLong).sum +
              (BigInt(cnt2(i, "conv")) * E12 / t).toLong
          i -> v
        }.toMap
      }
      x("start")
    }
    val base = absorb(None)
    val rows = channels.map(c => (c, absorb(Some(c))))
    val totEff = rows.map { case (_, r) => base - r }.sum
    spark.createDataFrame(rows.map { case (c, r) =>
        (c, base.toDouble / 1e12, r.toDouble / 1e12, base - r,
          if (totEff == 0L) 0.0 else (base - r).toDouble / totEff.toDouble)
      })
      .toDF("channel", "conv_base", "conv_removed", "effect_e12", "share")
      .orderBy($"channel")
  }

  /** The oracle replays the identical journey build, count pivot, and
    * 24 Jacobi iterations (`SELECT * REPLACE` per step — each CTE
    * references its predecessor once, so evaluation is linear).
    */
  private val qMarkovAttributionSql: String = {
    val channels = Seq("click", "error", "signup", "view")
    val states = "start" +: channels
    val dsts = channels :+ "conv"
    def cCol(i: String, d: String) = s"c_${i}_$d"
    val pivotCols = (states.flatMap(i => (dsts :+ "null").map(d =>
      s"MAX(CASE WHEN src = '$i' AND dst = '$d' THEN cnt ELSE 0 END) AS ${cCol(i, d)}"))).mkString(",\n        ")
    val totCols = states.map(i =>
      s"${(dsts :+ "null").map(d => cCol(i, d)).mkString(" + ")} AS tot_$i").mkString(",\n        ")
    val c2Cols = states.flatMap(i => dsts.map(d =>
      s"CASE WHEN chain IN ('$i', '$d') THEN 0 ELSE ${cCol(i, d)} END AS c2_${i}_$d")).mkString(",\n        ")
    // HUGEINT widens the cnt·x product (the Scala side uses BigInt);
    // the per-step result is ≤ 1e12 so the BIGINT narrowing is exact
    // and keeps every x_ column's type stable across iterations
    def stepExpr(i: String) =
      s"""CASE WHEN chain = '$i' OR tot_$i = 0 THEN CAST(0 AS BIGINT) ELSE CAST(${channels.map(d =>
        s"(CAST(c2_${i}_$d AS HUGEINT) * x_$d) // tot_$i").mkString(" + ")} + (CAST(c2_${i}_conv AS HUGEINT) * 1000000000000) // tot_$i AS BIGINT) END AS x_$i"""
    val iters = (1 to 24).map(k =>
      s"it$k AS (SELECT * REPLACE (${states.map(stepExpr).mkString(", ")}) FROM it${k - 1})").mkString(",\n")
    s"""WITH e AS (SELECT user_id, event_id, event_type FROM events),
      |fp AS (SELECT user_id, min(CASE WHEN event_type = 'purchase' THEN event_id END) AS pid
      |       FROM e GROUP BY 1),
      |jn AS (SELECT e.user_id, e.event_id, fp.pid,
      |        CASE WHEN e.event_type = 'purchase' THEN 'conv' ELSE e.event_type END AS dst,
      |        lag(CASE WHEN e.event_type = 'purchase' THEN 'conv' ELSE e.event_type END)
      |          OVER (PARTITION BY e.user_id ORDER BY e.event_id) AS prev
      |       FROM e JOIN fp ON fp.user_id = e.user_id
      |       WHERE fp.pid IS NULL OR e.event_id <= fp.pid),
      |term AS (SELECT jj.dst AS src, 'null' AS dst, count(*) AS cnt
      |         FROM (SELECT *, max(event_id) OVER (PARTITION BY user_id) AS mx FROM jn) jj
      |         WHERE jj.pid IS NULL AND jj.event_id = jj.mx GROUP BY 1),
      |tr AS (SELECT src, dst, CAST(sum(cnt) AS BIGINT) AS cnt FROM (
      |         SELECT coalesce(prev, 'start') AS src, dst, count(*) AS cnt FROM jn GROUP BY 1, 2
      |         UNION ALL SELECT * FROM term) GROUP BY 1, 2),
      |pv AS (SELECT
      |        $pivotCols
      |       FROM tr),
      |pt AS (SELECT *,
      |        $totCols
      |       FROM pv),
      |ch AS (SELECT *,
      |        $c2Cols
      |       FROM pt, (SELECT unnest(['none', ${channels.map(c => s"'$c'").mkString(", ")}]) AS chain)),
      |it0 AS (SELECT *, ${states.map(i => s"CAST(0 AS BIGINT) AS x_$i").mkString(", ")} FROM ch),
      |$iters,
      |res AS (SELECT chain, x_start AS conv_e12 FROM it24),
      |b AS (SELECT conv_e12 AS bval FROM res WHERE chain = 'none'),
      |s AS (SELECT CAST(sum(b2.bval - r2.conv_e12) AS BIGINT) AS teff
      |      FROM res r2, b b2 WHERE r2.chain <> 'none')
      |SELECT r.chain AS channel,
      |  CAST(b.bval AS DOUBLE) / 1000000000000.0 AS conv_base,
      |  CAST(r.conv_e12 AS DOUBLE) / 1000000000000.0 AS conv_removed,
      |  b.bval - r.conv_e12 AS effect_e12,
      |  CASE WHEN s.teff = 0 THEN 0.0
      |       ELSE CAST(b.bval - r.conv_e12 AS DOUBLE) / CAST(s.teff AS DOUBLE) END AS share
      |FROM res r, b, s WHERE r.chain <> 'none' ORDER BY channel""".stripMargin
  }

  /** Last-touch attribution: every purchase credits the user's most
    * recent preceding non-purchase event type, and channels roll up
    * to conversions + attributed revenue. The credit assignment is
    * one conditional LOCF window over the user's stream (the
    * `q_gap_fill` IGNORE NULLS pattern pointed backwards); purchases
    * with no preceding touch land in 'none'. One user_id window +
    * one bounded aggregate — the sessionization scale contract.
    */
  def qAttribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables(spark, dir).events
      .select($"user_id", $"event_id", $"event_type", $"value")
      .withColumn("touch",
        last(when($"event_type" =!= "purchase", $"event_type"),
          ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .groupBy(coalesce($"touch", lit("none")).as("channel"))
      .agg(count(lit(1)).as("conversions"),
        round(sum($"value"), 4).as("revenue"))
      .orderBy($"channel")
  }

  private val qAttributionSql =
    """WITH touched AS (
      |  SELECT user_id, event_id, event_type, value,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
      |      IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
      |  FROM events)
      |SELECT coalesce(touch, 'none') AS channel,
      |  count(*) AS conversions, round(sum(value), 4) AS revenue
      |FROM touched WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY channel""".stripMargin

  /** Winsorization: clamp each value to its own event type's
    * [p05, p95] — the robust-preprocessing sibling of
    * `q_outlier_iqr` (flagging) and `q_mad_stats` (scale): instead
    * of dropping outliers, cap them. One exact-percentile aggregate
    * to a type-cardinality table, one hint-free join back (AQE
    * broadcasts when it measures small — the tfidf rule), clamp in
    * codegen. Both engines state the identical clamp arithmetic on
    * the identical percentile doubles.
    */
  def qWinsorize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, dir).events
    val pct = e.groupBy($"event_type").agg(
      expr("percentile(value, 0.05)").as("lo"),
      expr("percentile(value, 0.95)").as("hi"))
    e.join(pct, "event_type")
      .select($"event_id", $"event_type", $"value",
        ($"value" < $"lo" || $"value" > $"hi").as("clamped"),
        round(least(greatest($"value", $"lo"), $"hi"), 4).as("w_value"))
      .orderBy($"event_id")
  }

  private val qWinsorizeSql =
    """WITH p AS (
      |  SELECT event_type, quantile_cont(value, 0.05) AS lo,
      |    quantile_cont(value, 0.95) AS hi
      |  FROM events GROUP BY event_type)
      |SELECT e.event_id, e.event_type, e.value,
      |  (e.value < p.lo OR e.value > p.hi) AS clamped,
      |  round(least(greatest(e.value, p.lo), p.hi), 4) AS w_value
      |FROM events e JOIN p USING (event_type)
      |ORDER BY e.event_id""".stripMargin

  /** Signup→purchase conversion lag per weekly signup cohort — the
    * growth metric behind activation dashboards. One aggregate finds
    * each user's first signup and first subsequent purchase (min_by
    * conditionals — map-side combinable); lags are integer hours
    * (micros `div`, the Triangles rule); one cohort-keyed aggregate
    * emits conversion counts + exact median/extreme lags. Two
    * shuffles total, both bounded by user then cohort cardinality.
    */
  def qConversionLag(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val firsts = Tables(spark, dir).events
      .groupBy($"user_id")
      .agg(
        min(when($"event_type" === "signup", $"ts")).as("s_ts"),
        min(when($"event_type" === "purchase", $"ts")).as("p_ts"))
      .filter($"s_ts".isNotNull)
      .withColumn("converted", $"p_ts".isNotNull && $"p_ts" >= $"s_ts")
      .withColumn("lag_hours",
        when($"converted",
          expr("(unix_micros(p_ts) - unix_micros(s_ts)) div 3600000000")))
      .withColumn("cohort_week", expr("unix_micros(s_ts) div 604800000000"))
    firsts.groupBy($"cohort_week")
      .agg(count(lit(1)).as("n_users"),
        sum(when($"converted", 1L).otherwise(0L)).as("n_converted"),
        round(expr("percentile(lag_hours, 0.5)"), 4).as("median_lag_h"),
        min($"lag_hours").as("min_lag_h"),
        max($"lag_hours").as("max_lag_h"))
      .orderBy($"cohort_week")
  }

  private val qConversionLagSql =
    """WITH firsts AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'signup' THEN ts END) AS s_ts,
      |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS p_ts
      |  FROM events GROUP BY user_id),
      |f AS (
      |  SELECT user_id, s_ts, p_ts,
      |    (p_ts IS NOT NULL AND p_ts >= s_ts) AS converted,
      |    CASE WHEN p_ts IS NOT NULL AND p_ts >= s_ts
      |      THEN (epoch_us(p_ts) - epoch_us(s_ts)) // 3600000000 END AS lag_hours,
      |    epoch_us(s_ts) // 604800000000 AS cohort_week
      |  FROM firsts WHERE s_ts IS NOT NULL)
      |SELECT cohort_week, count(*) AS n_users,
      |  CAST(sum(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
      |  round(quantile_cont(lag_hours, 0.5), 4) AS median_lag_h,
      |  min(lag_hours) AS min_lag_h, max(lag_hours) AS max_lag_h
      |FROM f GROUP BY cohort_week ORDER BY cohort_week""".stripMargin

  /** Native `session_window` sessionization — the built-in operator
    * tier next to the custom window-based `q_sessionize` (same
    * 30-minute gap semantics; this is Spark's own merging session
    * aggregate, which also runs STREAMING with watermarked state —
    * StreamingSpec pins that parity). Session end = last event + gap
    * by definition; the oracle restates sessions via the
    * gaps-and-islands window, pinning the two formulations equal.
    */
  def qSessionWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).events
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 4).as("session_value"))
      .select($"user_id",
        unix_micros($"session_window.start").as("start_us"),
        unix_micros($"session_window.end").as("end_us"),
        $"n_events", $"session_value")
      .orderBy($"user_id", $"start_us")
  }

  private val qSessionWindowSql =
    """WITH marked AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
      |      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |    THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |sess AS (
      |  SELECT user_id, ts, value,
      |    sum(new_session) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM marked)
      |SELECT user_id,
      |  min(epoch_us(ts)) AS start_us,
      |  max(epoch_us(ts)) + 1800000000 AS end_us,
      |  count(*) AS n_events,
      |  round(sum(value), 4) AS session_value
      |FROM sess GROUP BY user_id, session_id
      |ORDER BY user_id, start_us""".stripMargin

  /** Typed JSON parsing via `from_json` — the schema-on-read tier
    * above `etl_json_extract`'s path probe (`get_json_object`):
    * parse once into a typed struct (codegen'd Jackson, one parse
    * per row however many fields), aggregate on the typed column.
    * Malformed documents become NULL structs (PERMISSIVE) and are
    * counted — the corrupt-record accounting a lake intake needs.
    */
  def etlJsonSchema(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val parsed = Tables(spark, dir).events
      .withColumn("j", from_json($"props",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))))
    parsed.groupBy(($"j.k" % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"),
        sum(when($"j".isNull || $"j.k".isNull, 1L).otherwise(0L)).as("n_bad"),
        min($"j.k").as("k_min"), max($"j.k").as("k_max"))
      .orderBy($"k_mod")
  }

  private val etlJsonSchemaSql =
    """SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
      |  count(*) AS n,
      |  CAST(sum(CASE WHEN json_extract(props, '$.k') IS NULL
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
      |  min(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_min,
      |  max(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max
      |FROM events GROUP BY 1 ORDER BY k_mod""".stripMargin

  /** Top-10 session-opening paths: the first three event types of
    * every 30-minute session, joined into an `a>b>c` path string —
    * the product-analytics "how do sessions start" read. Reuses the
    * shared `Sessionize` operator (one user_id shuffle; windows
    * tie-break on event_id), truncates to rank ≤ 3 BEFORE the path
    * aggregation so the collect is 3-bounded per session, and the
    * final top-10 is a TakeOrderedAndProject heap over the
    * (paths)-cardinality count table. Ties break on the path string.
    */
  def qUserPaths(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val s = graft.operators.Sessionize(Tables(spark, dir).events,
      "user_id", "ts", "event_id", gapMicros = 30L * 60 * 1000000)
    val w = Window.partitionBy($"user_id", $"session_num")
      .orderBy($"ts", $"event_id")
    s.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .groupBy($"user_id", $"session_num")
      .agg(array_join(
        transform(array_sort(collect_list(struct($"rn", $"event_type"))),
          c => c.getField("event_type")), ">").as("path"))
      .groupBy($"path").agg(count(lit(1)).as("n_sessions"))
      .orderBy($"n_sessions".desc, $"path").limit(10)
  }

  private val qUserPathsSql =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |numbered AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_num
      |  FROM flagged),
      |ranked AS (
      |  SELECT user_id, session_num, event_type,
      |    row_number() OVER (PARTITION BY user_id, session_num
      |      ORDER BY ts, event_id) AS rn
      |  FROM numbered),
      |paths AS (
      |  SELECT user_id, session_num,
      |    string_agg(event_type, '>' ORDER BY rn) AS path
      |  FROM ranked WHERE rn <= 3 GROUP BY 1, 2)
      |SELECT path, count(*) AS n_sessions
      |FROM paths GROUP BY path
      |ORDER BY n_sessions DESC, path LIMIT 10""".stripMargin

  /** Shapley-value channel attribution — the game-theoretic upgrade
    * of `q_attribution`'s positional rules: each channel's credit is
    * its average marginal contribution over every exposure coalition.
    * The characteristic function v(S) = converted users whose channel
    * set ⊆ S reduces map-side to ≤16 subset counts (one per channel
    * bitmask), and EVERYTHING downstream runs on that 16-row
    * metadata: the subset-sum lattice, the 4!-weighted marginals
    * (×24 keeps the factorial weights integer — shapley24 is exact),
    * the final share. 100 TB of events → 16 longs before any game
    * theory happens.
    */
  def qShapleyAttribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val peru = Tables(spark, dir).events
      .groupBy($"user_id")
      .agg((max(when($"event_type" === "click", 1L).otherwise(0L)) +
        lit(2L) * max(when($"event_type" === "error", 1L).otherwise(0L)) +
        lit(4L) * max(when($"event_type" === "signup", 1L).otherwise(0L)) +
        lit(8L) * max(when($"event_type" === "view", 1L).otherwise(0L))).as("mask"),
        max(when($"event_type" === "purchase", 1L).otherwise(0L)).as("conv"))
    val cm = peru.groupBy($"mask").agg(sum($"conv").as("convs"))
    val masks = spark.range(16).select($"id".as("s"))
    val v = masks.join(cm, cm("mask").bitwiseAND($"s") === cm("mask"), "left")
      .groupBy($"s").agg(coalesce(sum($"convs"), lit(0L)).as("v"))
    val ch = Seq(("click", 1L), ("error", 2L), ("signup", 4L), ("view", 8L))
      .toDF("channel", "bit")
    val pairs = ch.crossJoin(masks)
      .filter($"s".bitwiseAND($"bit") === 0)
      .withColumn("pc", ($"s".bitwiseAND(1) + expr("(s div 2) & 1") +
        expr("(s div 4) & 1") + expr("(s div 8) & 1")))
      .withColumn("w", when($"pc" === 0, 6L).when($"pc" === 1, 2L)
        .when($"pc" === 2, 2L).otherwise(6L))
    val marg = pairs
      .join(v.select($"s", $"v".as("v_s")), "s")
      .join(v.select($"s".as("si"), $"v".as("v_si")), $"si" === $"s" + $"bit")
      .groupBy($"channel")
      .agg(sum($"w" * ($"v_si" - $"v_s")).as("shapley24"))
    val tot = v.agg((max(when($"s" === 15, $"v")) - max(when($"s" === 0, $"v")))
      .as("gains"))
    marg.crossJoin(broadcast(tot))
      .select($"channel", $"shapley24",
        when($"gains" > 0,
          round($"shapley24".cast("double") / (lit(24.0) * $"gains"), 6)).as("share"))
      .orderBy($"channel")
  }

  private val qShapleyAttributionSql =
    """WITH peru AS (
      |  SELECT user_id,
      |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |    + 2 * max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
      |    + 4 * max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
      |    + 8 * max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS mask,
      |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      |  FROM events GROUP BY 1),
      |cm AS (SELECT mask, CAST(sum(conv) AS BIGINT) AS convs FROM peru GROUP BY 1),
      |masks AS (SELECT range AS s FROM range(0, 16)),
      |v AS (
      |  SELECT s, CAST(coalesce(sum(convs), 0) AS BIGINT) AS v
      |  FROM masks LEFT JOIN cm ON (mask & s) = mask GROUP BY s),
      |ch AS (SELECT * FROM (VALUES ('click', 1), ('error', 2), ('signup', 4), ('view', 8)) AS t(channel, bit)),
      |pairs AS (
      |  SELECT channel, bit, s,
      |    (s & 1) + ((s // 2) & 1) + ((s // 4) & 1) + ((s // 8) & 1) AS pc
      |  FROM ch CROSS JOIN masks WHERE (s & bit) = 0),
      |marg AS (
      |  SELECT channel,
      |    CAST(sum((CASE pc WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END)
      |      * (vi.v - vs.v)) AS BIGINT) AS shapley24
      |  FROM pairs JOIN v vs ON vs.s = pairs.s JOIN v vi ON vi.s = pairs.s + bit
      |  GROUP BY channel),
      |tot AS (
      |  SELECT (SELECT v FROM v WHERE s = 15) - (SELECT v FROM v WHERE s = 0) AS gains)
      |SELECT channel, shapley24,
      |  CASE WHEN gains > 0
      |    THEN round(CAST(shapley24 AS DOUBLE) / (24.0 * gains), 6) END AS share
      |FROM marg CROSS JOIN tot ORDER BY channel""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("q_shapley_attribution", qShapleyAttribution _, qShapleyAttributionSql),
    QueryDef.sql("q_user_paths", qUserPaths _, qUserPathsSql),
    QueryDef.sql("etl_json_schema", etlJsonSchema _, etlJsonSchemaSql),
    QueryDef.sql("q_session_window", qSessionWindow _, qSessionWindowSql),
    QueryDef.sql("ts_resample_ohlc", tsResampleOhlc _, tsResampleOhlcSql),
    QueryDef.sql("q_conversion_lag", qConversionLag _, qConversionLagSql),
    QueryDef.sql("q_markov_transitions", qMarkovTransitions _, qMarkovTransitionsSql),
    QueryDef.sql("q_attribution", qAttribution _, qAttributionSql),
    QueryDef.sql("q_markov_attribution", qMarkovAttribution _, qMarkovAttributionSql),
    QueryDef.sql("q_winsorize", qWinsorize _, qWinsorizeSql))
}
