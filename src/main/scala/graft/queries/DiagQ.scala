package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 wave Q — regression diagnostics over the daily-revenue OLS
  * fit: influence analysis (leverage + Cook's distance), residual
  * autocorrelation (Durbin–Watson) and heteroscedasticity
  * (Breusch–Pagan LM). The fit itself is the q6-family trend model:
  * y(cents) per ship-day regressed on the day index.
  *
  * Scale design: the raw fact table reduces ONCE to the day-cardinality
  * series (map-side combinable); every sufficient statistic
  * (n, Σx, Σx², Σy, Σxy, SSE, Σu…) is an exact integer aggregate over
  * that bounded table, broadcast back as a 1-row fit relation.
  * Residuals quantize to whole dollars before squaring so SSE and the
  * BP co-moments stay in-range exact longs (documented headroom:
  * |e| ≤ ~9.6e8 dollars before Σe² would overflow — far beyond any
  * daily-revenue residual). Lag windows run over the ~2.4k-row daily
  * series, never row-level data.
  */
object DiagQ {

  /** Daily series + fitted residuals: (day, x, y, ed, …fit stats). */
  private def residuals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables(spark, dir).lineitem
      .select(expr("unix_micros(l_shipdate) div 86400000000").as("day"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("c"))
      .groupBy($"day").agg(sum($"c").as("y"))
    val d0 = daily.agg(min($"day").as("d0"))
    val pts = daily.crossJoin(broadcast(d0))
      .select($"day", ($"day" - $"d0").as("x"), $"y")
    val s = pts.agg(count(lit(1)).as("n"),
      sum($"x").as("sx"), sum($"x" * $"x").as("sxx"),
      sum($"y").as("sy"), sum($"x" * $"y").as("sxy"))
    val fit = s
      .withColumn("b", expr(
        "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"))
      .withColumn("a", expr("(CAST(sy AS DOUBLE) - b * sx) / n"))
    pts.crossJoin(broadcast(fit))
      .withColumn("ed", expr("CAST(round((y - (a + b * x)) / 100.0) AS BIGINT)"))
  }

  private val residualsSql =
    """daily AS (
      |  SELECT epoch_us(l_shipdate) // 86400000000 AS day,
      |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS y
      |  FROM lineitem GROUP BY 1),
      |dm AS (SELECT min(day) AS d0 FROM daily),
      |pts AS (SELECT day, day - d0 AS x, y FROM daily, dm),
      |s AS (
      |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
      |    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy
      |  FROM pts),
      |fit AS (
      |  SELECT n, sx, sxx, sy, sxy,
      |    (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS b
      |  FROM s),
      |ab AS (SELECT *, (CAST(sy AS DOUBLE) - b * sx) / n AS a FROM fit),
      |res AS (
      |  SELECT day, x, y, a, b, n, sx, sxx,
      |    CAST(round((y - (a + b * x)) / 100.0) AS BIGINT) AS ed
      |  FROM pts, ab)""".stripMargin

  // --------------------------------------------- q_regression_diagnostics
  /** Leverage h = 1/n + (x−x̄)²/Sxx and Cook's distance
    * D = e²h / (p·s²·(1−h)²) for every observation; the 15 most
    * influential days surface (TakeOrderedAndProject — no global
    * sort materializes). D quantizes to nanos for a total order.
    */
  def qRegressionDiagnostics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val res = residuals(spark, dir)
    val sse = res.agg(sum($"ed" * $"ed").as("sse"))
    res.crossJoin(broadcast(sse))
      .withColumn("h", expr(
        "1.0 / n + pow(x - CAST(sx AS DOUBLE) / n, 2) / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)"))
      .withColumn("cook_e9", expr(
        "CAST(round(1e9 * ed * ed * h / (2.0 * (CAST(sse AS DOUBLE) / (n - 2)) * pow(1.0 - h, 2))) AS BIGINT)"))
      .select($"day", $"x", $"y", $"ed",
        expr("round(h, 6)").as("leverage"),
        expr("round(cook_e9 / 1e9, 6)").as("cook_d"))
      // cook_d is injective in cook_e9 (6-decimal fixed point)
      .orderBy($"cook_d".desc, $"day").limit(15)
  }

  private val qRegressionDiagnosticsSql =
    s"""WITH $residualsSql,
       |sse AS (SELECT CAST(sum(ed * ed) AS BIGINT) AS sse FROM res),
       |d AS (
       |  SELECT day, x, y, ed,
       |    1.0 / n + pow(x - CAST(sx AS DOUBLE) / n, 2) / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) AS h,
       |    sse, n
       |  FROM res, sse),
       |c AS (
       |  SELECT day, x, y, ed, round(h, 6) AS leverage,
       |    CAST(round(1e9 * ed * ed * h / (2.0 * (CAST(sse AS DOUBLE) / (n - 2)) * pow(1.0 - h, 2))) AS BIGINT) AS cook_e9
       |  FROM d)
       |SELECT day, x, y, ed, leverage, round(cook_e9 / 1e9, 6) AS cook_d
       |FROM c ORDER BY cook_e9 DESC, day LIMIT 15""".stripMargin

  // ------------------------------------------------------ q_durbin_watson
  /** Durbin–Watson statistic DW = Σ(eₜ−eₜ₋₁)²/Σe² over the day-ordered
    * residual series — the lag runs over the ~2.4k-row aggregated
    * daily table (bounded metadata, the accepted serial-pass shape),
    * and both sums are exact longs on dollar-quantized residuals.
    */
  def qDurbinWatson(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val res = residuals(spark, dir).select($"day", $"ed")
    val lagged = res.withColumn("ep", lag($"ed", 1).over(Window.orderBy($"day")))
    lagged.agg(
        count(lit(1)).as("n"),
        sum($"ed" * $"ed").as("den"),
        sum(when($"ep".isNotNull, ($"ed" - $"ep") * ($"ed" - $"ep")).otherwise(0L))
          .as("num"))
      .select($"n",
        expr("round(CAST(num AS DOUBLE) / den, 6)").as("dw"))
  }

  private val qDurbinWatsonSql =
    s"""WITH $residualsSql,
       |l AS (
       |  SELECT ed, lag(ed) OVER (ORDER BY day) AS ep FROM res),
       |t AS (
       |  SELECT count(*) AS n, CAST(sum(ed * ed) AS BIGINT) AS den,
       |    CAST(sum(CASE WHEN ep IS NOT NULL THEN (ed - ep) * (ed - ep) ELSE 0 END) AS BIGINT) AS num
       |  FROM l)
       |SELECT n, round(CAST(num AS DOUBLE) / den, 6) AS dw FROM t""".stripMargin

  // ------------------------------------------------------ q_breusch_pagan
  /** Breusch–Pagan heteroscedasticity test: regress the squared
    * residual (megadollar² units, so co-moments stay exact longs) on
    * the day index; LM = n·R² against the χ²₁ 5% cut (3.841). One
    * aggregate over the bounded daily series.
    */
  def qBreuschPagan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val u = residuals(spark, dir)
      .select($"x", expr("(ed * ed) div 1000000").as("u"), $"n", $"sx", $"sxx")
    val s = u.groupBy($"n", $"sx", $"sxx")
      .agg(sum($"u").as("su"), sum($"u" * $"u").as("suu"),
        sum($"x" * $"u").as("sxu"))
    s.select($"n",
        expr("""round(pow(CAST(n AS DOUBLE) * sxu - CAST(sx AS DOUBLE) * su, 2) /
          |((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
          | (CAST(n AS DOUBLE) * suu - CAST(su AS DOUBLE) * su)), 6)"""
          .stripMargin.replace("\n", " ")).as("r2"),
        expr("""round(n * (pow(CAST(n AS DOUBLE) * sxu - CAST(sx AS DOUBLE) * su, 2) /
          |((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
          | (CAST(n AS DOUBLE) * suu - CAST(su AS DOUBLE) * su))), 4)"""
          .stripMargin.replace("\n", " ")).as("lm"),
        expr("""n * (pow(CAST(n AS DOUBLE) * sxu - CAST(sx AS DOUBLE) * su, 2) /
          |((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
          | (CAST(n AS DOUBLE) * suu - CAST(su AS DOUBLE) * su))) > 3.841"""
          .stripMargin.replace("\n", " ")).as("heteroscedastic"))
  }

  private val qBreuschPaganSql =
    s"""WITH $residualsSql,
       |u AS (SELECT x, (ed * ed) // 1000000 AS u, n, sx, sxx FROM res),
       |t AS (
       |  SELECT n, sx, sxx, CAST(sum(u) AS BIGINT) AS su,
       |    CAST(sum(u * u) AS BIGINT) AS suu, CAST(sum(x * u) AS BIGINT) AS sxu
       |  FROM u GROUP BY n, sx, sxx)
       |SELECT n,
       |  round(pow(CAST(n AS DOUBLE) * sxu - CAST(sx AS DOUBLE) * su, 2) / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *  (CAST(n AS DOUBLE) * suu - CAST(su AS DOUBLE) * su)), 6) AS r2,
       |  round(n * (pow(CAST(n AS DOUBLE) * sxu - CAST(sx AS DOUBLE) * su, 2) / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *  (CAST(n AS DOUBLE) * suu - CAST(su AS DOUBLE) * su))), 4) AS lm,
       |  n * (pow(CAST(n AS DOUBLE) * sxu - CAST(sx AS DOUBLE) * su, 2) / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *  (CAST(n AS DOUBLE) * suu - CAST(su AS DOUBLE) * su))) > 3.841 AS heteroscedastic
       |FROM t""".stripMargin

  // ---------------------------------------------------------------- registry

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("q_regression_diagnostics", qRegressionDiagnostics _, qRegressionDiagnosticsSql),
    QueryDef.sql("q_durbin_watson", qDurbinWatson _, qDurbinWatsonSql),
    QueryDef.sql("q_breusch_pagan", qBreuschPagan _, qBreuschPaganSql))
}
