package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 wave R — time-series representation and band analytics:
  * SAX symbolization (the classic Lin/Keogh discretization used for
  * motif/anomaly mining over huge series), Bollinger bands with the
  * breach test cross-multiplied to exact integers (the Hampel rule),
  * and a trailing cross-metric correlation.
  *
  * Scale design: every gate first reduces facts to the day-cardinality
  * series (map-side combinable); rolling windows then run over that
  * bounded metadata table (~2.4k rows — the documented serial-pass
  * shape), never over row-level data. Z-scores quantize to e6 integers
  * BEFORE any comparison with the (quantized) SAX breakpoints, so
  * symbol assignment is pure integer arithmetic on both engines.
  */
object SeriesQ {

  /** Daily revenue in whole dollars (keeps squared sums in exact-long
    * range: Σy² ≤ ~9e18 up to ~38M$/day across 2 500 days).
    */
  private val dailySql =
    """daily AS (
      |  SELECT epoch_us(l_shipdate) // 86400000000 AS day,
      |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) // 100 AS y
      |  FROM lineitem GROUP BY 1)""".stripMargin

  private def daily(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).lineitem
      .select(expr("unix_micros(l_shipdate) div 86400000000").as("day"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("c"))
      .groupBy($"day").agg(expr("sum(c) div 100").as("y"))
  }

  // ------------------------------------------------------------ ts_granger
  /** Granger causality (p=1) between the two daily event series —
    * purchase revenue (cents) and click count: does yesterday's x
    * predict today's y beyond yesterday's y? Both directions tested.
    * F = ((RSS_r − RSS_u)/p) / (RSS_u/(n − 2p − 1)) with the
    * unrestricted 2-feature fit solved by the exact-integer Cramer
    * recipe of `q_ols_multi`: every co-moment is an exact LONG
    * (integer cents × counts — headroom ~10³× at gate SFs, the
    * ols_multi long-range contract), cast once to double, and every
    * downstream expression is mirrored operation-for-operation in the
    * oracle — final doubles emitted UNROUNDED. Lag is observed-order
    * (previous observed day). Facts fold to the day series first;
    * everything after is bounded-metadata (the ts_ serial-pass shape).
    */
  def tsGranger(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    granger(Tables(spark, dir).events
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(when($"event_type" === "purchase",
          round($"value" * 100).cast("long")).otherwise(0L)).as("y"),
        sum(when($"event_type" === "click", 1L).otherwise(0L)).as("x")))
  }

  /** The Granger core over any (day, y, x) integer series frame —
    * split out so fixtures exercise the REAL lag/co-moment/F
    * arithmetic (the chunkDedup convention).
    */
  def granger(d: DataFrame): DataFrame = {
    val spark = d.sparkSession
    import spark.implicits._
    val w = Window.orderBy($"day")
    val lagged = d
      .withColumn("ly", lag($"y", 1).over(w))
      .withColumn("lx", lag($"x", 1).over(w))
      .filter($"ly".isNotNull)
    def dirStats(zc: org.apache.spark.sql.Column, x1c: org.apache.spark.sql.Column,
                 x2c: org.apache.spark.sql.Column, name: String) =
      lagged.agg(
          count(lit(1)).as("n"),
          sum(x1c).as("sx1"), sum(x2c).as("sx2"), sum(zc).as("sz"),
          sum(x1c * x1c).as("s11"), sum(x2c * x2c).as("s22"),
          sum(x1c * x2c).as("s12"),
          sum(x1c * zc).as("s1z"), sum(x2c * zc).as("s2z"),
          sum(zc * zc).as("szz"))
        .select(lit(name).as("direction"), $"n".as("n_obs"),
          ($"n" * $"s11" - $"sx1" * $"sx1").cast("double").as("c11"),
          ($"n" * $"s22" - $"sx2" * $"sx2").cast("double").as("c22"),
          ($"n" * $"s12" - $"sx1" * $"sx2").cast("double").as("c12"),
          ($"n" * $"s1z" - $"sx1" * $"sz").cast("double").as("c1z"),
          ($"n" * $"s2z" - $"sx2" * $"sz").cast("double").as("c2z"),
          ($"n" * $"szz" - $"sz" * $"sz").cast("double").as("czz"))
        .select($"direction", $"n_obs",
          (($"c22" * $"c1z" - $"c12" * $"c2z") / ($"c11" * $"c22" - $"c12" * $"c12")).as("b_self"),
          (($"c11" * $"c2z" - $"c12" * $"c1z") / ($"c11" * $"c22" - $"c12" * $"c12")).as("b_cross"),
          $"c11", $"c1z", $"c2z", $"czz")
        .select($"direction", $"n_obs", $"b_self", $"b_cross",
          ($"czz" - $"b_self" * $"c1z" - $"b_cross" * $"c2z").as("rss_u"),
          ($"czz" - $"c1z" * $"c1z" / $"c11").as("rss_r"))
        .select($"direction", $"n_obs", $"b_self", $"b_cross",
          // a saturated unrestricted fit (rss_u = 0, exact — the
          // co-moments are integers) has no finite F: emit NULL, both
          // engines (Spark ANSI would throw, DuckDB would read inf)
          when($"rss_u" === 0.0, lit(null).cast("double"))
            .otherwise((($"rss_r" - $"rss_u") / lit(1.0)) /
              ($"rss_u" / ($"n_obs" - lit(3)).cast("double"))).as("f_stat"))
    // x1 = lag of the TARGET (self), x2 = lag of the other series
    dirStats($"y", $"ly", $"lx", "x_to_y")
      .unionByName(dirStats($"x", $"lx", $"ly", "y_to_x"))
      .orderBy($"direction")
  }

  private val tsGrangerSql = {
    def dirSql(z: String, x1: String, x2: String, name: String) =
      s"""SELECT '$name' AS direction, n AS n_obs,
        |  (c22 * c1z - c12 * c2z) / (c11 * c22 - c12 * c12) AS b_self,
        |  (c11 * c2z - c12 * c1z) / (c11 * c22 - c12 * c12) AS b_cross,
        |  CASE WHEN (czz - ((c22 * c1z - c12 * c2z) / (c11 * c22 - c12 * c12)) * c1z - ((c11 * c2z - c12 * c1z) / (c11 * c22 - c12 * c12)) * c2z) = 0.0 THEN NULL ELSE
        |  (((czz - c1z * c1z / c11) - (czz - ((c22 * c1z - c12 * c2z) / (c11 * c22 - c12 * c12)) * c1z - ((c11 * c2z - c12 * c1z) / (c11 * c22 - c12 * c12)) * c2z)) / 1.0)
        |    / ((czz - ((c22 * c1z - c12 * c2z) / (c11 * c22 - c12 * c12)) * c1z - ((c11 * c2z - c12 * c1z) / (c11 * c22 - c12 * c12)) * c2z) / CAST(n - 3 AS DOUBLE)) END AS f_stat
        |FROM (SELECT n,
        |    CAST(n * s11 - sx1 * sx1 AS DOUBLE) AS c11,
        |    CAST(n * s22 - sx2 * sx2 AS DOUBLE) AS c22,
        |    CAST(n * s12 - sx1 * sx2 AS DOUBLE) AS c12,
        |    CAST(n * s1z - sx1 * sz AS DOUBLE) AS c1z,
        |    CAST(n * s2z - sx2 * sz AS DOUBLE) AS c2z,
        |    CAST(n * szz - sz * sz AS DOUBLE) AS czz
        |  FROM (SELECT count(*) AS n,
        |      CAST(sum($x1) AS BIGINT) AS sx1, CAST(sum($x2) AS BIGINT) AS sx2,
        |      CAST(sum($z) AS BIGINT) AS sz,
        |      CAST(sum($x1 * $x1) AS BIGINT) AS s11, CAST(sum($x2 * $x2) AS BIGINT) AS s22,
        |      CAST(sum($x1 * $x2) AS BIGINT) AS s12,
        |      CAST(sum($x1 * $z) AS BIGINT) AS s1z, CAST(sum($x2 * $z) AS BIGINT) AS s2z,
        |      CAST(sum($z * $z) AS BIGINT) AS szz
        |    FROM lagged WHERE ly IS NOT NULL))""".stripMargin
    s"""WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x
      |  FROM events GROUP BY 1),
      |lagged AS (SELECT y, x,
      |    lag(y) OVER (ORDER BY day) AS ly, lag(x) OVER (ORDER BY day) AS lx
      |  FROM d)
      |${dirSql("y", "ly", "lx", "x_to_y")}
      |UNION ALL
      |${dirSql("x", "lx", "ly", "y_to_x")}
      |ORDER BY direction""".stripMargin
  }

  // ----------------------------------------------------- ts_matrix_profile
  /** Matrix profile (Yeh et al., ICDM'16): for every 7-day window of
    * each event-type's daily-count series, the nearest z-normalized
    * neighbor among non-overlapping windows (|i−j| ≥ m — the
    * exclusion zone) — THE motif/discord primitive: a low profile
    * value is a repeated pattern, a high one an anomaly.
    *
    * Exactness: z-normalized distance reduces to Pearson correlation
    * (d² = 2m(1 − r)), and with integer daily counts every Σ term of
    * r (window sums, squares, cross products — 7 explicit indexed
    * terms, no reduction) is an EXACT LONG; the one float step is
    * num/√(da·db), e6-quantized before the argmax so neighbor choice
    * is integer-deterministic in both engines. Zero-variance windows
    * are excluded by an exact integer test (7·Σaa = Σa²).
    *
    * Scale shape: facts fold to the day×type series first (map-side
    * combinable); the window pair join is per-series quadratic over
    * BOUNDED series metadata (the documented serial-pass shape shared
    * by every ts_ gate), partition-parallel across series keys. For a
    * long series the production path is the same join banded to
    * |i−j| ≤ horizon.
    */
  def tsMatrixProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    matrixProfile(Tables(spark, dir).events
      .groupBy($"event_type", expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("cnt")))
  }

  /** The profile core over any (event_type, day, cnt) series frame —
    * split out so fixtures exercise the REAL window/pair/argmax
    * arithmetic (the chunkDedup convention).
    */
  def matrixProfile(dailyByType: DataFrame): DataFrame = {
    val spark = dailyByType.sparkSession
    import spark.implicits._
    val m = 7
    def terms(f: Int => String) = (1 to m).map(f).mkString(" + ")
    val win = dailyByType.groupBy($"event_type")
      .agg(expr("transform(array_sort(collect_list(struct(day, cnt))), s -> s.cnt)").as("ys"))
      // series shorter than one window yield no rows. Without this
      // guard Spark diverges from the oracle on sparse-but-valid
      // input: sequence(1, size-6) defaults to step -1 when size < 7
      // (a DESCENDING range, ADVICE r13), and slice(ys, 0, 7) then
      // throws — while DuckDB's range(1, len-5) is simply empty.
      .filter(size($"ys") >= m)
      .select($"event_type", $"ys",
        explode(expr(s"sequence(1, size(ys) - ${m - 1})")).as("p"))
      .select($"event_type", $"p".cast("long").as("i"),
        expr(s"slice(ys, p, $m)").as("w"))
      .withColumn("sa", expr(terms(k => s"element_at(w, $k)")))
      .withColumn("saa", expr(terms(k => s"element_at(w, $k) * element_at(w, $k)")))
      .withColumn("d", lit(m.toLong) * $"saa" - $"sa" * $"sa")
      .filter($"d" > 0)
    val a = win.select($"event_type", $"i".as("ia"), $"w".as("wa"),
      $"sa".as("sxa"), $"d".as("da"))
    val b = win.select($"event_type", $"i".as("ib"), $"w".as("wb"),
      $"sa".as("sxb"), $"d".as("db"))
    val ce = a.join(b, Seq("event_type"))
      .filter(abs($"ia" - $"ib") >= m)
      .withColumn("num",
        lit(m.toLong) * expr(terms(k => s"element_at(wa, $k) * element_at(wb, $k)")) -
          $"sxa" * $"sxb")
      .withColumn("corr_e6", expr(
        "CAST(round(1e6 * CAST(num AS DOUBLE) / sqrt(CAST(da AS DOUBLE) * CAST(db AS DOUBLE))) AS BIGINT)"))
    val w = Window.partitionBy($"event_type", $"ia")
      .orderBy($"corr_e6".desc, $"ib")
    ce.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"event_type", $"ia".as("win_i"), $"ib".as("nn_j"),
        round($"corr_e6" / 1e6, 6).as("nn_corr"),
        round(sqrt(greatest(lit(2.0 * m) * (lit(1.0) - $"corr_e6" / 1e6), lit(0.0))), 4)
          .as("nn_dist"))
      .orderBy($"event_type", $"win_i")
  }

  private val tsMatrixProfileSql = {
    def t7(f: Int => String) = (1 to 7).map(f).mkString(" + ")
    s"""WITH daily2 AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS cnt
      |         FROM events GROUP BY 1, 2),
      |arr AS (SELECT event_type, list(cnt ORDER BY day) AS ys FROM daily2 GROUP BY 1),
      |win0 AS (SELECT event_type, ys, unnest(range(1, len(ys) - 5)) AS i FROM arr),
      |win AS (SELECT event_type, i, list_slice(ys, i, i + 6) AS w FROM win0),
      |ws AS (SELECT event_type, i, w,
      |        ${t7(k => s"w[$k]")} AS sa,
      |        ${t7(k => s"w[$k]*w[$k]")} AS saa
      |       FROM win),
      |wf AS (SELECT *, 7*saa - sa*sa AS d FROM ws WHERE 7*saa - sa*sa > 0),
      |pr AS (SELECT a.event_type AS event_type, a.i AS ia, b.i AS ib,
      |        7*(${t7(k => s"a.w[$k]*b.w[$k]")}) - a.sa*b.sa AS num,
      |        a.d AS da, b.d AS db
      |       FROM wf a JOIN wf b ON a.event_type = b.event_type AND abs(a.i - b.i) >= 7),
      |ce AS (SELECT event_type, ia, ib,
      |        CAST(round(1e6 * CAST(num AS DOUBLE) / sqrt(CAST(da AS DOUBLE) * CAST(db AS DOUBLE))) AS BIGINT) AS corr_e6
      |       FROM pr),
      |rk AS (SELECT *, row_number() OVER (PARTITION BY event_type, ia ORDER BY corr_e6 DESC, ib) AS rn FROM ce)
      |SELECT event_type, ia AS win_i, ib AS nn_j,
      |  round(corr_e6 / 1e6, 6) AS nn_corr,
      |  round(sqrt(greatest(14.0 * (1 - corr_e6 / 1e6), 0)), 4) AS nn_dist
      |FROM rk WHERE rn = 1 ORDER BY event_type, win_i""".stripMargin
  }

  // ----------------------------------------------------------------- ts_sax
  /** SAX: z-normalize the daily series, piecewise-aggregate over 7-day
    * frames, and map each frame mean to a 4-symbol alphabet at the
    * N(0,1) quartile breakpoints (±0.6745, 0). Breakpoint comparison
    * happens on e6-quantized integers — bit-exact symbols.
    */
  def tsSax(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = daily(spark, dir)
    val d0 = d.agg(min($"day").as("d0"), count(lit(1)).as("n"),
      sum($"y").as("sy"), sum($"y" * $"y").as("syy"))
    val z = d.crossJoin(broadcast(d0))
      .withColumn("z_e6", expr(
        """CAST(round(1e6 * (y - CAST(sy AS DOUBLE) / n) /
          |sqrt((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / (n - 1))) AS BIGINT)"""
          .stripMargin.replace("\n", " ")))
      .withColumn("w", expr("(day - d0) div 7"))
    z.groupBy($"w")
      .agg(count(lit(1)).as("n_days"), sum($"z_e6").as("sz"))
      .withColumn("paa_e6", expr("CAST(round(CAST(sz AS DOUBLE) / n_days) AS BIGINT)"))
      .select($"w", $"n_days",
        expr("round(paa_e6 / 1e6, 6)").as("paa"),
        expr("""CASE WHEN paa_e6 < -674500 THEN 'a' WHEN paa_e6 < 0 THEN 'b'
          |WHEN paa_e6 < 674500 THEN 'c' ELSE 'd' END"""
          .stripMargin.replace("\n", " ")).as("sym"))
      .orderBy($"w")
  }

  private val tsSaxSql =
    s"""WITH $dailySql,
       |st AS (
       |  SELECT min(day) AS d0, count(*) AS n, CAST(sum(y) AS BIGINT) AS sy,
       |    CAST(sum(y * y) AS BIGINT) AS syy
       |  FROM daily),
       |z AS (
       |  SELECT (day - d0) // 7 AS w,
       |    CAST(round(1e6 * (y - CAST(sy AS DOUBLE) / n) / sqrt((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / (n - 1))) AS BIGINT) AS z_e6
       |  FROM daily, st),
       |p AS (
       |  SELECT w, count(*) AS n_days, CAST(sum(z_e6) AS BIGINT) AS sz
       |  FROM z GROUP BY w),
       |q AS (SELECT w, n_days, CAST(round(CAST(sz AS DOUBLE) / n_days) AS BIGINT) AS paa_e6 FROM p)
       |SELECT w, n_days, round(paa_e6 / 1e6, 6) AS paa,
       |  CASE WHEN paa_e6 < -674500 THEN 'a' WHEN paa_e6 < 0 THEN 'b' WHEN paa_e6 < 674500 THEN 'c' ELSE 'd' END AS sym
       |FROM q ORDER BY w""".stripMargin

  // ----------------------------------------------------------- ts_bollinger
  /** 20-observation trailing Bollinger bands over daily revenue. The
    * band values are final-mile doubles, but the BREACH decision
    * cross-multiplies to exact longs:
    * (c·y − S)²·(c−1) > 4·c·(c·Q − S²) ⇔ |y − mean| > 2·sd.
    */
  def tsBollinger(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.orderBy($"day").rowsBetween(-19, 0)
    daily(spark, dir)
      .withColumn("s", sum($"y").over(w))
      .withColumn("q", sum($"y" * $"y").over(w))
      .withColumn("c", count(lit(1)).over(w))
      .filter($"c" === 20)
      .select($"day", $"y",
        expr("round(CAST(s AS DOUBLE) / c, 4)").as("mean"),
        expr("round(CAST(s AS DOUBLE) / c + 2 * sqrt(CAST(c * q - s * s AS DOUBLE) / (c * (c - 1))), 4)").as("upper"),
        expr("round(CAST(s AS DOUBLE) / c - 2 * sqrt(CAST(c * q - s * s AS DOUBLE) / (c * (c - 1))), 4)").as("lower"),
        expr("c * y - s > 0 AND (c * y - s) * (c * y - s) * (c - 1) > 4 * c * (c * q - s * s)").as("breach_hi"),
        expr("c * y - s < 0 AND (c * y - s) * (c * y - s) * (c - 1) > 4 * c * (c * q - s * s)").as("breach_lo"))
      .orderBy($"day")
  }

  private val tsBollingerSql =
    s"""WITH $dailySql,
       |r AS (
       |  SELECT day, y,
       |    CAST(sum(y) OVER w AS BIGINT) AS s,
       |    CAST(sum(y * y) OVER w AS BIGINT) AS q,
       |    CAST(count(*) OVER w AS BIGINT) AS c
       |  FROM daily
       |  WINDOW w AS (ORDER BY day ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
       |SELECT day, y,
       |  round(CAST(s AS DOUBLE) / c, 4) AS mean,
       |  round(CAST(s AS DOUBLE) / c + 2 * sqrt(CAST(c * q - s * s AS DOUBLE) / (c * (c - 1))), 4) AS upper,
       |  round(CAST(s AS DOUBLE) / c - 2 * sqrt(CAST(c * q - s * s AS DOUBLE) / (c * (c - 1))), 4) AS lower,
       |  c * y - s > 0 AND (c * y - s) * (c * y - s) * (c - 1) > 4 * c * (c * q - s * s) AS breach_hi,
       |  c * y - s < 0 AND (c * y - s) * (c * y - s) * (c - 1) > 4 * c * (c * q - s * s) AS breach_lo
       |FROM r WHERE c = 20 ORDER BY day""".stripMargin

  // -------------------------------------------------------- ts_rolling_corr
  /** 14-observation trailing Pearson correlation (the events lake spans 30 days at every SF — a fortnight window keeps the gate populated) between the daily
    * click and purchase counts — windowed integer co-moments, one
    * final-mile double expression per row. Zero-variance windows
    * surface as NULL via nullif.
    */
  def tsRollingCorr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables(spark, dir).events
      .select(expr("unix_micros(ts) div 86400000000").as("day"), $"event_type")
      .groupBy($"day")
      .agg(sum(when($"event_type" === "click", 1L).otherwise(0L)).as("a"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("b"))
    val w = Window.orderBy($"day").rowsBetween(-13, 0)
    d.withColumn("c", count(lit(1)).over(w))
      .withColumn("sa", sum($"a").over(w)).withColumn("sb", sum($"b").over(w))
      .withColumn("saa", sum($"a" * $"a").over(w))
      .withColumn("sbb", sum($"b" * $"b").over(w))
      .withColumn("sab", sum($"a" * $"b").over(w))
      .filter($"c" === 14)
      .select($"day", $"a", $"b",
        expr("""round((CAST(c AS DOUBLE) * sab - CAST(sa AS DOUBLE) * sb) /
          |nullif(sqrt(CAST(c AS DOUBLE) * saa - CAST(sa AS DOUBLE) * sa) *
          |sqrt(CAST(c AS DOUBLE) * sbb - CAST(sb AS DOUBLE) * sb), 0.0), 6)"""
          .stripMargin.replace("\n", " ")).as("corr14"))
      .orderBy($"day")
  }

  private val tsRollingCorrSql =
    """WITH d AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS a,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS b
      |  FROM events GROUP BY 1),
      |r AS (
      |  SELECT day, a, b,
      |    CAST(count(*) OVER w AS BIGINT) AS c,
      |    CAST(sum(a) OVER w AS BIGINT) AS sa, CAST(sum(b) OVER w AS BIGINT) AS sb,
      |    CAST(sum(a * a) OVER w AS BIGINT) AS saa,
      |    CAST(sum(b * b) OVER w AS BIGINT) AS sbb,
      |    CAST(sum(a * b) OVER w AS BIGINT) AS sab
      |  FROM d
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
      |SELECT day, a, b,
      |  round((CAST(c AS DOUBLE) * sab - CAST(sa AS DOUBLE) * sb) / nullif(sqrt(CAST(c AS DOUBLE) * saa - CAST(sa AS DOUBLE) * sa) * sqrt(CAST(c AS DOUBLE) * sbb - CAST(sb AS DOUBLE) * sb), 0.0), 6) AS corr14
      |FROM r WHERE c = 14 ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- registry

  // ------------------------------------------------------------------ ts_haar
  /** Haar wavelet multi-resolution energy decomposition of the daily
    * revenue series — which timescales (days / weeks / months / …)
    * carry the variance, the dyadic complement of `ts_periodogram`.
    * The series embeds into the standard dyadic frame (first 2048
    * observations, zero-padded when shorter); each level halves the
    * approximation a_k = (a_{2k}+a_{2k+1})/2 and emits details
    * d_k = (a_{2k}−a_{2k+1})/2 — divisions by 2 are exact in
    * IEEE doubles, so every coefficient is bit-identical cross-engine.
    * Details quantize to e4 integers BEFORE squaring (d² itself
    * exceeds the 53-bit mantissa), and per-level energy accumulates in
    * decimal(38,0). Eleven `withColumn` steps over a ONE-ROW collected
    * array (day-cardinality state, the q_ship_latency rule) — linear
    * plan growth, no recursion blow-up; the oracle is a recursive CTE
    * over the same list halving.
    */
  def tsHaar(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables(spark, dir).orders
      .groupBy(expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
    var cur = daily
      .agg(array_sort(collect_list(struct($"day", $"cents"))).as("s"))
      .select(expr(
        """concat(
          |  transform(slice(s, 1, 2048), x -> cast(x.cents as double)),
          |  array_repeat(0.0D, 2048 - size(slice(s, 1, 2048))))""".stripMargin).as("a0"))
    val levels = 11
    for (l <- 1 to levels) {
      val prev = s"a${l - 1}"
      cur = cur
        .withColumn(s"a$l", expr(
          s"transform(sequence(0, ${2048 / (1 << l) - 1}), " +
            s"k -> (element_at($prev, 2 * k + 1) + element_at($prev, 2 * k + 2)) / 2.0D)"))
        .withColumn(s"e$l", expr(
          s"aggregate(transform(sequence(0, ${2048 / (1 << l) - 1}), " +
            s"k -> (element_at($prev, 2 * k + 1) - element_at($prev, 2 * k + 2)) / 2.0D), " +
            s"cast(0 as decimal(38,0)), " +
            s"(acc, d) -> acc + cast(cast(round(d * 1e4) as decimal(38,0)) * cast(round(d * 1e4) as decimal(38,0)) as decimal(38,0)))"))
    }
    val lvls = (1 to levels).map(l =>
      s"named_struct('level', ${l}L, 'n_coeffs', ${2048 / (1 << l)}L, " +
        s"'energy', cast(e$l as double) / 1e8)").mkString(", ")
    cur.withColumn("approx", expr(s"round(element_at(a$levels, 1) / 100.0D, 4)"))
      .select(explode(expr(s"array($lvls)")).as("r"), $"approx")
      .select($"r.level".as("level"), $"r.n_coeffs".as("n_coeffs"),
        $"r.energy".as("energy"), $"approx")
      .orderBy($"level")
  }

  private val tsHaarSql =
    """WITH RECURSIVE daily AS (
      |  SELECT epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS day,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |arr AS (
      |  SELECT list(CAST(cents AS DOUBLE) ORDER BY day) AS a FROM daily),
      |base AS (
      |  SELECT list_concat(a[1:2048],
      |    list_transform(range(0, 2048 - len(a[1:2048])), x -> CAST(0.0 AS DOUBLE))) AS a0
      |  FROM arr),
      |rec(lvl, a, energy) AS (
      |  SELECT CAST(0 AS BIGINT), a0, CAST(NULL AS HUGEINT) FROM base
      |  UNION ALL
      |  SELECT lvl + 1,
      |    list_transform(range(0, CAST(len(a) // 2 AS BIGINT)),
      |      k -> (a[CAST(2 * k + 1 AS INTEGER)] + a[CAST(2 * k + 2 AS INTEGER)]) / 2.0),
      |    list_sum(list_transform(range(0, CAST(len(a) // 2 AS BIGINT)),
      |      k -> CAST(round((a[CAST(2 * k + 1 AS INTEGER)] - a[CAST(2 * k + 2 AS INTEGER)]) / 2.0 * 1e4) AS HUGEINT)
      |         * CAST(round((a[CAST(2 * k + 1 AS INTEGER)] - a[CAST(2 * k + 2 AS INTEGER)]) / 2.0 * 1e4) AS HUGEINT)))
      |  FROM rec WHERE len(a) > 1),
      |fin AS (SELECT round(a[1] / 100.0, 4) AS approx FROM rec WHERE lvl = 11)
      |SELECT lvl AS level, CAST(len(a) AS BIGINT) AS n_coeffs,
      |  CAST(energy AS DOUBLE) / 1e8 AS energy, approx
      |FROM rec, fin WHERE lvl >= 1 ORDER BY level""".stripMargin

  // ---------------------------------------------------------------- ts_kalman
  /** 1-D local-level Kalman filter over daily revenue — the adaptive
    * smoother between `ts_ewma` (fixed gain) and `ts_holt` (trend):
    * predict P⁻ = P + Q, gain K = P⁻/(P⁻+R), update
    * x̂ += K(y − x̂), P = (1−K)P⁻, with Q = 1/4 and R = 1 binary
    * fractions — the gain trajectory is a deterministic IEEE sequence
    * (it converges to the steady-state K fast, which the spec pins)
    * and both engines run the IDENTICAL recurrence assembled from the
    * same sub-expression strings (the ts_holt_winters discipline).
    * One `aggregate` HOF over the day-cardinality collected array;
    * recursive-CTE oracle.
    */
  def tsKalman(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val y = "cast(x.cents as double)"
    val kk = "((acc.p + 0.25D) / (acc.p + 0.25D + 1.0D))"
    val xp = s"(acc.xh + $kk * ($y - acc.xh))"
    val pp = s"((1.0D - $kk) * (acc.p + 0.25D))"
    val daily = Tables(spark, dir).orders
      .groupBy(expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
    daily.agg(array_sort(collect_list(struct($"day", $"cents"))).as("s"))
      .select(explode(expr(
        s"""aggregate(s,
          |  named_struct('xh', cast(null as double), 'p', 1.0D,
          |    'out', cast(array() as array<struct<day:bigint,cents:bigint,xh:double,k:double,p:double>>)),
          |  (acc, x) -> CASE WHEN acc.xh IS NULL THEN
          |      named_struct('xh', $y, 'p', 1.0D,
          |        'out', array(named_struct('day', x.day, 'cents', x.cents,
          |          'xh', $y, 'k', cast(null as double), 'p', 1.0D)))
          |    ELSE named_struct('xh', $xp, 'p', $pp,
          |      'out', array_append(acc.out, named_struct('day', x.day, 'cents', x.cents,
          |        'xh', $xp, 'k', $kk, 'p', $pp))) END,
          |  acc -> acc.out)""".stripMargin)))
      .select($"col.day".as("day"), $"col.cents".as("cents"),
        round($"col.xh" / 100, 4).as("level"),
        round($"col.k", 6).as("gain"),
        round($"col.p", 6).as("variance"))
      .orderBy($"day")
  }

  private val tsKalmanSql = {
    val y = "CAST(t.cents AS DOUBLE)"
    val kk = "((r.p + 0.25) / (r.p + 0.25 + 1.0))"
    val xp = s"(r.xh + $kk * ($y - r.xh))"
    val pp = s"((1.0 - $kk) * (r.p + 0.25))"
    s"""WITH RECURSIVE daily AS (
      |  SELECT epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS day,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |idx AS (
      |  SELECT day, cents, row_number() OVER (ORDER BY day) AS i FROM daily),
      |rec(i, day, cents, xh, k, p) AS (
      |  SELECT i, day, cents, CAST(cents AS DOUBLE), CAST(NULL AS DOUBLE),
      |    CAST(1.0 AS DOUBLE)
      |  FROM idx WHERE i = 1
      |  UNION ALL
      |  SELECT t.i, t.day, t.cents, $xp, $kk, $pp
      |  FROM rec r JOIN idx t ON t.i = r.i + 1)
      |SELECT day, cents, round(xh / 100, 4) AS level, round(k, 6) AS gain,
      |  round(p, 6) AS variance
      |FROM rec ORDER BY day""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("ts_sax", tsSax _, tsSaxSql),
    QueryDef.sql("ts_bollinger", tsBollinger _, tsBollingerSql),
    QueryDef.sql("ts_rolling_corr", tsRollingCorr _, tsRollingCorrSql),
    QueryDef.sql("ts_haar", tsHaar _, tsHaarSql),
    QueryDef.sql("ts_kalman", tsKalman _, tsKalmanSql),
    QueryDef.sql("ts_matrix_profile", tsMatrixProfile _, tsMatrixProfileSql),
    QueryDef.sql("ts_granger", tsGranger _, tsGrangerSql))
}
