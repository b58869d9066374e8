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

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("ts_sax", tsSax _, tsSaxSql),
    QueryDef.sql("ts_bollinger", tsBollinger _, tsBollingerSql),
    QueryDef.sql("ts_rolling_corr", tsRollingCorr _, tsRollingCorrSql))
}
