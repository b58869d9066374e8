package graft.queries

import graft.Tables
import graft.operators.PrefixSum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-6 wave 4 — distribution diagnostics and time-series anomaly
  * analytics: rolling z-score anomalies, a Gini concentration index,
  * a two-sample Kolmogorov–Smirnov test, a Benford first-digit audit
  * and lagged autocorrelation. Shared design rules: reduce to exact
  * integer sufficient statistics (cents) before any floating point,
  * round shared intermediates before derived arithmetic (the q_ab_test
  * recipe), and replace every global-ordering window with either a
  * per-key partition or the PrefixSum bucket-offset two-pass.
  */
object TsQ {

  private def dailyCents(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).events
      .filter($"event_type" === "purchase")
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(round($"value" * 100).cast("long")).as("cents"))
  }

  /** Rolling z-score anomaly detection on daily revenue per event
    * type — the monitoring primitive. The daily series is exact
    * integer cents; the trailing-7-day mean is an exact-integer sum
    * divided by 7 (bit-identical IEEE in both engines) and the stddev
    * runs over the same 7 exact integers; both are ROUNDED to 4
    * decimals before the z division so the flag arithmetic sees
    * identical inputs. Windows partition by event_type — never a
    * global ordering — and operate on the (types × days)-row
    * aggregate, not the events.
    */
  def tsZscoreAnomaly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables(spark, dir).events
      .groupBy($"event_type", expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(round($"value" * 100).cast("long")).as("cents"))
    val w = Window.partitionBy($"event_type").orderBy($"day").rowsBetween(-6, 0)
    daily
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("mean7", round(avg($"cents").over(w), 4))
      .withColumn("std7", round(stddev_samp($"cents").over(w), 4))
      .filter($"n_win" === 7 && $"std7" > 0)
      .withColumn("z", round(($"cents" - $"mean7") / $"std7", 4))
      .select($"event_type", $"day", $"cents", $"mean7", $"std7", $"z",
        (abs($"z") > 2.5).as("anomaly"))
      .orderBy($"event_type", $"day")
  }

  private val tsZscoreAnomalySql =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, day, cents,
      |    count(*) OVER win AS n_win,
      |    round(avg(cents) OVER win, 4) AS mean7,
      |    round(stddev_samp(cents) OVER win, 4) AS std7
      |  FROM daily
      |  WINDOW win AS (PARTITION BY event_type ORDER BY day
      |                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      |SELECT event_type, day, cents, mean7, std7,
      |  round((cents - mean7) / std7, 4) AS z,
      |  abs(round((cents - mean7) / std7, 4)) > 2.5 AS anomaly
      |FROM w WHERE n_win = 7 AND std7 > 0
      |ORDER BY event_type, day""".stripMargin

  /** Gini coefficient of customer spend concentration — the
    * inequality read on any long-tailed distribution (spend, tokens
    * per domain, docs per source). Per-customer cents are exact
    * integers; the global rank comes from the PrefixSum bucket-offset
    * two-pass (running count of 1s over the spend ordering — no
    * single-partition window over customers); Σ rank·x accumulates in
    * decimal(38,0) (DuckDB's hugeint twin), so both engines convert
    * the same exact integer to double once, at the final ratio.
    */
  def qGini(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables(spark, dir).orders
      .groupBy($"o_custkey")
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
    val ranked = PrefixSum.running(per,
      orderCol = struct($"cents", $"o_custkey"),
      bucket = ($"cents" / 1000000L).cast("long"),
      sumCols = Seq("one" -> lit(1L)))
      .withColumnRenamed("cum_one", "i")
    ranked.agg(
      count(lit(1)).as("n_customers"),
      sum($"cents").as("total_cents"),
      sum($"i".cast(DecimalType(38, 0)) * $"cents").as("six"))
      .select($"n_customers", $"total_cents",
        round((lit(2.0) * $"six".cast("double") -
          ($"n_customers" + lit(1.0)) * $"total_cents") /
          ($"n_customers".cast("double") * $"total_cents"), 6).as("gini"))
  }

  private val qGiniSql =
    """WITH per AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |r AS (SELECT cents,
      |        row_number() OVER (ORDER BY cents, o_custkey) AS i
      |      FROM per)
      |SELECT count(*) AS n_customers,
      |  CAST(sum(cents) AS BIGINT) AS total_cents,
      |  round((2.0 * CAST(sum(i * cents) AS DOUBLE) -
      |    (count(*) + 1.0) * CAST(sum(cents) AS BIGINT)) /
      |    (CAST(count(*) AS DOUBLE) * CAST(sum(cents) AS BIGINT)), 6) AS gini
      |FROM r""".stripMargin

  /** Two-sample Kolmogorov–Smirnov statistic between the even- and
    * odd-user purchase-value distributions — the drift detector for
    * "did this cohort's distribution change". Values quantize to
    * exact cents; cumulative counts come from the PrefixSum two-pass
    * (parallel, no global window over distinct values); and D stays
    * an INTEGER maximum of |cumA·nB − cumB·nA| until the single final
    * division, so both engines agree bit-for-bit.
    */
  def qKsTest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = Tables(spark, dir).events
      .filter($"event_type" === "purchase")
      .select(round($"value" * 100).cast("long").as("cents"),
        ($"user_id" % 2 === 0).as("a"))
    val per = p.groupBy($"cents").agg(
      sum(when($"a", 1L).otherwise(0L)).as("ca"),
      sum(when(!$"a", 1L).otherwise(0L)).as("cb"))
    val cum = PrefixSum.running(per,
      orderCol = $"cents",
      bucket = ($"cents" / 1000L).cast("long"),
      sumCols = Seq("ca" -> $"ca", "cb" -> $"cb"))
    val tot = p.agg(
      sum(when($"a", 1L).otherwise(0L)).as("n_a"),
      sum(when(!$"a", 1L).otherwise(0L)).as("n_b"))
    cum.crossJoin(broadcast(tot))
      .select($"n_a", $"n_b",
        abs($"cum_ca" * $"n_b" - $"cum_cb" * $"n_a").as("gap"))
      .groupBy($"n_a", $"n_b")
      .agg(max($"gap").as("d_num"))
      .select($"n_a", $"n_b", $"d_num",
        round($"d_num".cast("double") /
          ($"n_a".cast("double") * $"n_b"), 6).as("d_stat"))
  }

  private val qKsTestSql =
    """WITH p AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
      |    user_id % 2 = 0 AS a
      |  FROM events WHERE event_type = 'purchase'),
      |per AS (
      |  SELECT cents,
      |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS cb
      |  FROM p GROUP BY 1),
      |c AS (
      |  SELECT CAST(sum(ca) OVER (ORDER BY cents) AS BIGINT) AS cum_ca,
      |    CAST(sum(cb) OVER (ORDER BY cents) AS BIGINT) AS cum_cb
      |  FROM per),
      |t AS (
      |  SELECT CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      |  FROM p)
      |SELECT n_a, n_b,
      |  CAST(max(abs(cum_ca * n_b - cum_cb * n_a)) AS BIGINT) AS d_num,
      |  round(CAST(max(abs(cum_ca * n_b - cum_cb * n_a)) AS DOUBLE) /
      |    (CAST(n_a AS DOUBLE) * n_b), 6) AS d_stat
      |FROM c, t GROUP BY n_a, n_b""".stripMargin

  /** Benford first-digit audit of order totals — the fraud/data-entry
    * screen. The leading digit comes from the INTEGER-STRING route
    * (cents → varchar → first char): integer printing is identical in
    * every engine, where float printing and log10 both are not. The
    * expected Benford mass is a 9-literal table, not a runtime log —
    * no libm in the gate at all. Frequencies divide exact integers.
    */
  def qBenford(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val digits = Tables(spark, dir).orders
      .select(substring(round($"o_totalprice" * 100).cast("long").cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy($"digit").agg(count(lit(1)).as("n"))
    val expected = typedLit(Map(
      1L -> 0.3010, 2L -> 0.1761, 3L -> 0.1249, 4L -> 0.0969, 5L -> 0.0792,
      6L -> 0.0669, 7L -> 0.0580, 8L -> 0.0512, 9L -> 0.0458))
    digits.crossJoin(broadcast(digits.agg(sum($"n").as("total"))))
      .withColumn("freq", round($"n" / $"total", 4))
      .withColumn("expected_freq", expected($"digit"))
      .select($"digit", $"n", $"freq", $"expected_freq",
        round(abs($"freq" - $"expected_freq"), 4).as("abs_dev"))
      .orderBy($"digit")
  }

  private val qBenfordSql =
    """WITH d AS (
      |  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
      |    count(*) AS n
      |  FROM orders GROUP BY 1),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM d),
      |e AS (SELECT unnest([1,2,3,4,5,6,7,8,9]) AS digit,
      |        unnest([0.3010,0.1761,0.1249,0.0969,0.0792,0.0669,0.0580,0.0512,0.0458]) AS expected_freq)
      |SELECT d.digit, d.n, round(d.n / t.total, 4) AS freq,
      |  e.expected_freq,
      |  round(abs(round(d.n / t.total, 4) - e.expected_freq), 4) AS abs_dev
      |FROM d, t JOIN e ON e.digit = d.digit
      |ORDER BY d.digit""".stripMargin

  /** Autocorrelation of daily purchase revenue at lags 1–7 — the
    * seasonality detector feeding q_weekday_seasonality's hypothesis.
    * The daily series is aggregated metadata (one row per day — tiny
    * forever), so the lag self-join broadcasts; `corr` reduces each
    * lag to co-moments over exact integer cents and rounds to 4 (the
    * q_corr_stats parity precedent).
    */
  def tsAcf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = dailyCents(spark, dir)
    val lags = spark.range(1, 8).select($"id".as("lag"))
    daily.as("a")
      .crossJoin(broadcast(lags))
      .join(broadcast(daily.as("b")), expr("b.day = a.day - lag"))
      .groupBy($"lag")
      .agg(count(lit(1)).as("n_pairs"),
        round(corr($"a.cents", $"b.cents"), 4).as("acf"))
      .orderBy($"lag")
  }

  private val tsAcfSql =
    """WITH daily AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |lags AS (SELECT range AS lag FROM range(1, 8))
      |SELECT lag, count(*) AS n_pairs,
      |  round(corr(a.cents, b.cents), 4) AS acf
      |FROM daily a CROSS JOIN lags
      |JOIN daily b ON b.day = a.day - lag
      |GROUP BY lag ORDER BY lag""".stripMargin

  /** Lorenz curve companion to q_gini: cumulative spend share at
    * each population decile — the "top 10% hold X%" readout. Reuses
    * the PrefixSum global rank (bucket-offset two-pass, no
    * single-partition window); the decile assignment is integer
    * arithmetic on the rank (ceil(10·i/n) via (10·i + n − 1) div n),
    * and shares divide exact integer cents.
    */
  def qLorenzCurve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables(spark, dir).orders
      .groupBy($"o_custkey")
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
    val ranked = PrefixSum.running(per,
      orderCol = struct($"cents", $"o_custkey"),
      bucket = ($"cents" / 1000000L).cast("long"),
      sumCols = Seq("one" -> lit(1L), "cents" -> $"cents"))
    val tot = per.agg(count(lit(1)).as("n"), sum($"cents").as("total"))
    ranked.crossJoin(broadcast(tot))
      .withColumn("decile", expr("(10 * cum_one + n - 1) div n"))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n_customers"),
        max($"cum_cents").as("cum_cents"),
        first($"total").as("total"))
      .select($"decile", $"n_customers", $"cum_cents",
        ($"cum_cents".cast("double") / $"total").as("cum_share"))
      .orderBy($"decile")
  }

  private val qLorenzCurveSql =
    """WITH per AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |t AS (SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS total FROM per),
      |r AS (
      |  SELECT CAST(row_number() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS i,
      |    CAST(sum(cents) OVER (ORDER BY cents, o_custkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
      |  FROM per)
      |SELECT (10 * i + n - 1) // n AS decile,
      |  count(*) AS n_customers,
      |  CAST(max(cum_cents) AS BIGINT) AS cum_cents,
      |  CAST(max(cum_cents) AS DOUBLE) / total AS cum_share
      |FROM r, t GROUP BY 1, total ORDER BY decile""".stripMargin

  /** Cross-correlation function between the purchase and view daily
    * revenue series at lags −3…+3 — does engagement LEAD revenue (and
    * by how many days), the companion read to `ts_acf`'s self-memory.
    * ONE events scan produces both series as conditional sums per day
    * (exact cents); the ±3 lag fan-out joins the days-cardinality
    * daily aggregate against its broadcast self, and `corr` reduces
    * each lag to co-moments (the ts_acf / q_corr_stats parity
    * precedent).
    */
  def tsCcf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables(spark, dir).events
      .filter($"event_type".isin("purchase", "view"))
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(when($"event_type" === "purchase", round($"value" * 100).cast("long"))
          .otherwise(0L)).as("p_cents"),
        sum(when($"event_type" === "view", round($"value" * 100).cast("long"))
          .otherwise(0L)).as("v_cents"))
    val lags = spark.range(-3, 4).select($"id".as("lag"))
    daily.as("a")
      .crossJoin(broadcast(lags))
      .join(broadcast(daily.as("b")), expr("b.day = a.day - lag"))
      .groupBy($"lag")
      .agg(count(lit(1)).as("n_pairs"),
        round(corr($"a.p_cents", $"b.v_cents"), 4).as("ccf"))
      .orderBy($"lag")
  }

  private val tsCcfSql =
    """WITH daily AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day,
      |    CAST(sum(CASE WHEN event_type = 'purchase'
      |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS p_cents,
      |    CAST(sum(CASE WHEN event_type = 'view'
      |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS v_cents
      |  FROM events WHERE event_type IN ('purchase', 'view') GROUP BY 1),
      |lags AS (SELECT range AS lag FROM range(-3, 4))
      |SELECT lag, count(*) AS n_pairs,
      |  round(corr(a.p_cents, b.v_cents), 4) AS ccf
      |FROM daily a CROSS JOIN lags
      |JOIN daily b ON b.day = a.day - lag
      |GROUP BY lag ORDER BY lag""".stripMargin

  /** STL-lite weekly seasonal decomposition of daily revenue: a
    * centered 7-row moving trend, the detrended residual, and a
    * per-weekday seasonal index — all in EXACT integer units
    * (detrended = 7·rev − trendSum, the cross-multiplication rule, so
    * no division ever happens; windows only span a ROWS frame whose
    * day-span is verified == 6, so a gap in the series nulls the
    * estimate instead of silently averaging the wrong week). The
    * frame runs over the days-cardinality daily aggregate — metadata,
    * never the events (the changepoint-scan rule).
    */
  def tsSeasonalDecompose(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w7 = Window.orderBy($"day").rowsBetween(-3, 3)
    val d = dailyCents(spark, dir)
      .withColumn("span_ok", count(lit(1)).over(w7) === 7 &&
        max($"day").over(w7) - min($"day").over(w7) === 6)
      .withColumn("trend7_c", when($"span_ok", sum($"cents").over(w7)))
      .withColumn("detr7_c", when($"span_ok", $"cents" * 7 - $"trend7_c"))
    d.filter($"detr7_c".isNotNull)
      .groupBy(($"day" % 7).as("weekday"))
      .agg(count(lit(1)).as("n_days"), sum($"detr7_c").as("sum_detr7_c"),
        round(sum($"detr7_c").cast("double") / (count(lit(1)) * 700.0), 4)
          .as("seasonal_idx_dollars"))
      .orderBy($"weekday")
  }

  private val tsSeasonalDecomposeSql =
    """WITH daily AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |t AS (
      |  SELECT day, cents,
      |    count(*) OVER w = 7 AND max(day) OVER w - min(day) OVER w = 6 AS span_ok,
      |    CAST(sum(cents) OVER w AS BIGINT) AS trend7_c
      |  FROM daily
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |r AS (
      |  SELECT day % 7 AS weekday, cents * 7 - trend7_c AS detr7_c
      |  FROM t WHERE span_ok)
      |SELECT weekday, count(*) AS n_days, CAST(sum(detr7_c) AS BIGINT) AS sum_detr7_c,
      |  round(CAST(sum(detr7_c) AS DOUBLE) / (count(*) * 700.0), 4)
      |    AS seasonal_idx_dollars
      |FROM r GROUP BY 1 ORDER BY weekday""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("ts_ccf", tsCcf _, tsCcfSql),
    QueryDef.sql("ts_seasonal_decompose", tsSeasonalDecompose _, tsSeasonalDecomposeSql),
    QueryDef.sql("q_lorenz_curve", qLorenzCurve _, qLorenzCurveSql),
    QueryDef.sql("ts_zscore_anomaly", tsZscoreAnomaly _, tsZscoreAnomalySql),
    QueryDef.sql("q_gini", qGini _, qGiniSql),
    QueryDef.sql("q_ks_test", qKsTest _, qKsTestSql),
    QueryDef.sql("q_benford", qBenford _, qBenfordSql),
    QueryDef.sql("ts_acf", tsAcf _, tsAcfSql))
}
