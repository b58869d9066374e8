package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 wave — association strength and effect sizes: Cramér's V,
  * categorical mutual information, two-feature OLS via exact normal
  * equations, and Kendall's τ-b over the aggregated daily series.
  * Same sufficient-statistics discipline as InferQ/StatsQ: reduce to
  * exact integer co-moments first (map-side combinable — 100 TB
  * becomes a handful of longs per group), quantize any libm output
  * (ln) to integer nanos before cross-row sums, and run the final-
  * mile double arithmetic as the IDENTICAL expression in both
  * engines.
  */
object AssocQ {

  // ------------------------------------------------------------ q_cramers_v

  /** Cramér's V for event type × weekday — the effect-size companion
    * to `q_crosstab_chi2` (χ² grows with n; V is the scale-free
    * [0,1] association strength a drift monitor can threshold). Same
    * contingency recipe: one integer aggregate, EMPTY cells filled
    * explicitly, per-cell χ² contributions quantized to 1e-4 before
    * the cross-cell sum; V then computes from the ROUNDED χ² and
    * exact integers, so sqrt sees bit-identical input in both
    * engines. Weekday is epoch-day arithmetic ((day+4)%7), not an
    * engine DOW function — the q_weekday_seasonality portability
    * rule.
    */
  def qCramersV(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val observed = Tables(spark, dir).events
      .groupBy($"event_type",
        ((expr("unix_micros(ts) div 86400000000") + 4) % 7).as("weekday"))
      .agg(count(lit(1)).as("o"))
    val cells = observed.select($"event_type").distinct()
      .crossJoin(observed.select($"weekday").distinct())
      .join(observed, Seq("event_type", "weekday"), "left")
      .withColumn("o", coalesce($"o", lit(0L)))
    val margins = cells
      .withColumn("row_n", sum($"o").over(Window.partitionBy($"event_type")))
      .withColumn("col_n", sum($"o").over(Window.partitionBy($"weekday")))
      .crossJoin(broadcast(cells.agg(sum($"o").as("total"))))
    margins
      .withColumn("e", $"row_n" * $"col_n" / $"total")
      .withColumn("c1e4",
        round(($"o" - $"e") * ($"o" - $"e") / $"e" * 10000).cast("long"))
      .agg(sum($"o").as("n_events"),
        countDistinct($"event_type").as("n_rows"),
        countDistinct($"weekday").as("n_cols"),
        (sum($"c1e4") / 10000.0).as("chi2raw"))
      .select($"n_events", $"n_rows", $"n_cols",
        round($"chi2raw", 4).as("chi2"),
        round(sqrt($"chi2raw" / ($"n_events" * (least($"n_rows", $"n_cols") - 1))), 6)
          .as("cramers_v"))
  }

  private val qCramersVSql =
    """WITH observed AS (
      |  SELECT event_type, (epoch_us(ts) // 86400000000 + 4) % 7 AS weekday,
      |    count(*) AS o
      |  FROM events GROUP BY 1, 2),
      |cells AS (
      |  SELECT t.event_type, c.weekday, coalesce(o.o, 0) AS o
      |  FROM (SELECT DISTINCT event_type FROM observed) t
      |  CROSS JOIN (SELECT DISTINCT weekday FROM observed) c
      |  LEFT JOIN observed o
      |    ON o.event_type = t.event_type AND o.weekday = c.weekday),
      |m AS (
      |  SELECT *,
      |    sum(o) OVER (PARTITION BY event_type) AS row_n,
      |    sum(o) OVER (PARTITION BY weekday) AS col_n,
      |    sum(o) OVER () AS total
      |  FROM cells),
      |agg AS (
      |  SELECT CAST(sum(o) AS BIGINT) AS n_events,
      |    count(DISTINCT event_type) AS n_rows,
      |    count(DISTINCT weekday) AS n_cols,
      |    sum(CAST(round((o - row_n * col_n / total) * (o - row_n * col_n / total)
      |      / (row_n * col_n / total) * 10000) AS BIGINT)) / 10000.0 AS chi2raw
      |  FROM m)
      |SELECT n_events, n_rows, n_cols, round(chi2raw, 4) AS chi2,
      |  round(sqrt(chi2raw / (n_events * (least(n_rows, n_cols) - 1))), 6) AS cramers_v
      |FROM agg""".stripMargin

  // ---------------------------------------------------------- q_mutual_info

  /** Mutual information between document language and source — the
    * information-theoretic dependence read next to `q_cramers_v`'s
    * normalized χ². The joint table is ONE integer aggregate (langs ×
    * sources cells — empty cells contribute exactly 0 to MI, so no
    * fill step); each p·ln term's ln argument is a division of two
    * exact long PRODUCTS (nxy·n and nx·ny both fit comfortably), and
    * the term nano-quantizes before the cross-cell sum (the
    * corpus_token_entropy ln recipe). 100 TB reduces to
    * |langs|×|sources| longs.
    */
  def qMutualInfo(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables(spark, dir).documents
      .groupBy($"lang", $"source").agg(count(lit(1)).as("nxy"))
    val m = cells
      .withColumn("nx", sum($"nxy").over(Window.partitionBy($"lang")))
      .withColumn("ny", sum($"nxy").over(Window.partitionBy($"source")))
      .crossJoin(broadcast(cells.agg(sum($"nxy").as("n"))))
    m.withColumn("t9",
        round(($"nxy" / $"n") * log(($"nxy" * $"n") / ($"nx" * $"ny")) * 1e9).cast("long"))
      .agg(max($"n").as("n_docs"), count(lit(1)).as("n_cells"),
        sum($"t9").as("mi_e9"))
      .select($"n_docs", $"n_cells", $"mi_e9",
        round($"mi_e9" / 1e9, 6).as("mutual_info"))
  }

  private val qMutualInfoSql =
    """WITH cells AS (
      |  SELECT lang, source, count(*) AS nxy FROM documents GROUP BY 1, 2),
      |m AS (
      |  SELECT nxy,
      |    sum(nxy) OVER (PARTITION BY lang) AS nx,
      |    sum(nxy) OVER (PARTITION BY source) AS ny,
      |    sum(nxy) OVER () AS n
      |  FROM cells)
      |SELECT CAST(max(n) AS BIGINT) AS n_docs, count(*) AS n_cells,
      |  CAST(sum(CAST(round((nxy / n) * ln((nxy * n) / (nx * ny)) * 1e9) AS BIGINT)) AS BIGINT) AS mi_e9,
      |  round(CAST(sum(CAST(round((nxy / n) * ln((nxy * n) / (nx * ny)) * 1e9) AS BIGINT)) AS BIGINT) / 1e9, 6) AS mutual_info
      |FROM m""".stripMargin

  // ----------------------------------------------------------- q_ols_multi

  /** Two-feature OLS per market segment: order value regressed on
    * customer account balance AND order recency — the multivariate
    * step past `q_forecast_linreg`'s single regressor, solved by
    * EXACT normal equations instead of an iterative fitter. All nine
    * sufficient statistics (n, Σx₁, Σx₂, Σy, Σx₁², Σx₂², Σx₁x₂,
    * Σx₁y, Σx₂y) are integer sums in whole-dollar / day units —
    * map-side combinable, so 100 TB per segment reduces to nine
    * longs. The centered co-moments S·· = n·Σxy − Σx·Σy stay within
    * long range at gate SFs (headroom ~10³×; a larger lake rebases
    * units or widens to DECIMAL), cast once to double, and the
    * closed-form Cramer solve is one IEEE-deterministic expression
    * mirrored in the oracle.
    */
  def qOlsMulti(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val day0 = t.orders.agg(min(expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")).as("day0"))
    val base = t.orders
      .join(t.customer.select($"c_custkey", $"c_mktsegment",
        round($"c_acctbal").cast("long").as("x1")), $"o_custkey" === $"c_custkey")
      .crossJoin(broadcast(day0))
      .select($"c_mktsegment",
        $"x1",
        (expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000") - $"day0").as("x2"),
        round($"o_totalprice").cast("long").as("y"))
    val s = base.groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum($"x1").as("sx1"), sum($"x2").as("sx2"), sum($"y").as("sy"),
        sum($"x1" * $"x1").as("s11"), sum($"x2" * $"x2").as("s22"),
        sum($"x1" * $"x2").as("s12"),
        sum($"x1" * $"y").as("s1y"), sum($"x2" * $"y").as("s2y"))
    s.select($"c_mktsegment", $"n",
        ($"n" * $"s11" - $"sx1" * $"sx1").cast("double").as("c11"),
        ($"n" * $"s22" - $"sx2" * $"sx2").cast("double").as("c22"),
        ($"n" * $"s12" - $"sx1" * $"sx2").cast("double").as("c12"),
        ($"n" * $"s1y" - $"sx1" * $"sy").cast("double").as("c1y"),
        ($"n" * $"s2y" - $"sx2" * $"sy").cast("double").as("c2y"),
        $"sx1", $"sx2", $"sy")
      .select($"c_mktsegment", $"n",
        (($"c22" * $"c1y" - $"c12" * $"c2y") / ($"c11" * $"c22" - $"c12" * $"c12")).as("b1"),
        (($"c11" * $"c2y" - $"c12" * $"c1y") / ($"c11" * $"c22" - $"c12" * $"c12")).as("b2"),
        $"sx1", $"sx2", $"sy")
      .select($"c_mktsegment", $"n".as("n_orders"),
        round($"b1", 6).as("b_acctbal"), round($"b2", 6).as("b_day"),
        round(($"sy" - $"b1" * $"sx1" - $"b2" * $"sx2") / $"n", 4).as("intercept"))
      .orderBy($"c_mktsegment")
  }

  private val qOlsMultiSql =
    """WITH day0 AS (
      |  SELECT min(epoch_us(o_orderdate) // 86400000000) AS d0 FROM orders),
      |base AS (
      |  SELECT c_mktsegment,
      |    CAST(round(c_acctbal) AS BIGINT) AS x1,
      |    epoch_us(o_orderdate) // 86400000000 - d0 AS x2,
      |    CAST(round(o_totalprice) AS BIGINT) AS y
      |  FROM orders JOIN customer ON o_custkey = c_custkey, day0),
      |s AS (
      |  SELECT c_mktsegment, count(*) AS n,
      |    CAST(sum(x1) AS BIGINT) AS sx1, CAST(sum(x2) AS BIGINT) AS sx2,
      |    CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x1 * x1) AS BIGINT) AS s11, CAST(sum(x2 * x2) AS BIGINT) AS s22,
      |    CAST(sum(x1 * x2) AS BIGINT) AS s12,
      |    CAST(sum(x1 * y) AS BIGINT) AS s1y, CAST(sum(x2 * y) AS BIGINT) AS s2y
      |  FROM base GROUP BY 1),
      |c AS (
      |  SELECT c_mktsegment, n, sx1, sx2, sy,
      |    CAST(n * s11 - sx1 * sx1 AS DOUBLE) AS c11,
      |    CAST(n * s22 - sx2 * sx2 AS DOUBLE) AS c22,
      |    CAST(n * s12 - sx1 * sx2 AS DOUBLE) AS c12,
      |    CAST(n * s1y - sx1 * sy AS DOUBLE) AS c1y,
      |    CAST(n * s2y - sx2 * sy AS DOUBLE) AS c2y
      |  FROM s),
      |b AS (
      |  SELECT c_mktsegment, n, sx1, sx2, sy,
      |    (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) AS b1,
      |    (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) AS b2
      |  FROM c)
      |SELECT c_mktsegment, n AS n_orders,
      |  round(b1, 6) AS b_acctbal, round(b2, 6) AS b_day,
      |  round((sy - b1 * sx1 - b2 * sx2) / n, 4) AS intercept
      |FROM b ORDER BY c_mktsegment""".stripMargin

  // --------------------------------------------------------- q_kendall_tau

  /** Kendall's τ-b between daily order count and daily revenue — the
    * rank-concordance read `q_spearman_corr` approximates with rank
    * moments. Exact τ needs every pair; the scale shape is the
    * etl_binpack rule: the pair join runs over the AGGREGATED daily
    * series (bounded by calendar days, NOT data volume — 100 TB still
    * aggregates to ~2 400 rows before the self-join, and the join
    * side broadcasts). Concordant / discordant / tie counts are pure
    * integers; τ-b's sqrt runs once on exact longs cast to double,
    * identically in both engines.
    */
  def qKendallTau(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables(spark, dir).orders
      .groupBy(expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("day"))
      .agg(count(lit(1)).as("x"),
        sum(round($"o_totalprice" * 100).cast("long")).as("y"))
    val pairs = daily.select($"day".as("d1"), $"x".as("x1"), $"y".as("y1"))
      .join(daily.select($"day".as("d2"), $"x".as("x2"), $"y".as("y2")),
        $"d1" < $"d2")
    val cnt = pairs.agg(
      count(lit(1)).as("n_pairs"),
      sum(when(($"x1" < $"x2" && $"y1" < $"y2") || ($"x1" > $"x2" && $"y1" > $"y2"), 1L)
        .otherwise(0L)).as("concordant"),
      sum(when(($"x1" < $"x2" && $"y1" > $"y2") || ($"x1" > $"x2" && $"y1" < $"y2"), 1L)
        .otherwise(0L)).as("discordant"),
      sum(when($"x1" === $"x2", 1L).otherwise(0L)).as("tied_x"),
      sum(when($"y1" === $"y2", 1L).otherwise(0L)).as("tied_y"))
    cnt.crossJoin(broadcast(daily.agg(count(lit(1)).as("n_days"))))
      .select($"n_days", $"n_pairs", $"concordant", $"discordant", $"tied_x", $"tied_y",
        round(($"concordant" - $"discordant").cast("double") /
          sqrt(($"n_pairs" - $"tied_x").cast("double") * ($"n_pairs" - $"tied_y").cast("double")), 6)
          .as("tau_b"))
  }

  private val qKendallTauSql =
    """WITH daily AS (
      |  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
      |    count(*) AS x,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      |p AS (
      |  SELECT a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
      |  FROM daily a JOIN daily b ON a.day < b.day),
      |cnt AS (
      |  SELECT count(*) AS n_pairs,
      |    CAST(sum(CASE WHEN (x1 < x2 AND y1 < y2) OR (x1 > x2 AND y1 > y2) THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
      |    CAST(sum(CASE WHEN (x1 < x2 AND y1 > y2) OR (x1 > x2 AND y1 < y2) THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
      |    CAST(sum(CASE WHEN x1 = x2 THEN 1 ELSE 0 END) AS BIGINT) AS tied_x,
      |    CAST(sum(CASE WHEN y1 = y2 THEN 1 ELSE 0 END) AS BIGINT) AS tied_y
      |  FROM p),
      |nd AS (SELECT count(*) AS n_days FROM daily)
      |SELECT n_days, n_pairs, concordant, discordant, tied_x, tied_y,
      |  round(CAST(concordant - discordant AS DOUBLE) /
      |    sqrt(CAST(n_pairs - tied_x AS DOUBLE) * CAST(n_pairs - tied_y AS DOUBLE)), 6) AS tau_b
      |FROM cnt, nd""".stripMargin

  // --------------------------------------------------------- q_levene_test

  /** Brown–Forsythe (median-based Levene) test of variance
    * homogeneity across order priorities — the assumption check
    * `q_anova_f` silently makes. The integer trick: deviations from
    * the group median stay EXACT by working in doubled whole-dollar
    * units (the median of longs is either a long or a half-integer,
    * so 2·|x − med| is always integer); the per-group sufficient
    * statistics (n, Σz, Σz²) are then map-side-combinable longs and
    * the F arithmetic runs once on exact longs cast to double,
    * identically in both engines. Group medians use the
    * percentile ↔ quantile_cont parity the q_percentiles gate pins.
    */
  def qLeveneTest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables(spark, dir).orders
      .select($"o_orderpriority".as("grp"), round($"o_totalprice").cast("long").as("v"))
    val med = o.groupBy($"grp")
      .agg(round(percentile($"v", lit(0.5)) * 2).cast("long").as("med2"))
    val z = o.join(med, "grp")
      .withColumn("z", abs($"v" * 2 - $"med2"))
    val perGrp = z.groupBy($"grp")
      .agg(count(lit(1)).as("n"), sum($"z").as("s"), sum($"z" * $"z").as("ss"))
    perGrp.agg(
        sum($"n").as("n_total"), count(lit(1)).as("k"),
        sum($"s").as("s_tot"), sum($"ss").as("ss_tot"),
        sum($"s".cast("double") * $"s".cast("double") / $"n").as("sum_si2_over_n"))
      .select($"n_total", $"k",
        round(((($"sum_si2_over_n" - $"s_tot".cast("double") * $"s_tot".cast("double") / $"n_total") / ($"k" - 1)) /
          (($"ss_tot" - $"sum_si2_over_n") / ($"n_total" - $"k"))), 4).as("f_levene"))
  }

  private val qLeveneTestSql =
    """WITH o AS (
      |  SELECT o_orderpriority AS grp, CAST(round(o_totalprice) AS BIGINT) AS v
      |  FROM orders),
      |med AS (
      |  SELECT grp, CAST(round(quantile_cont(v, 0.5) * 2) AS BIGINT) AS med2
      |  FROM o GROUP BY 1),
      |z AS (
      |  SELECT o.grp, abs(v * 2 - med2) AS z FROM o JOIN med ON o.grp = med.grp),
      |pg AS (
      |  SELECT grp, count(*) AS n, CAST(sum(z) AS BIGINT) AS s,
      |    CAST(sum(z * z) AS BIGINT) AS ss
      |  FROM z GROUP BY 1),
      |t AS (
      |  SELECT CAST(sum(n) AS BIGINT) AS n_total, count(*) AS k,
      |    CAST(sum(s) AS BIGINT) AS s_tot, CAST(sum(ss) AS BIGINT) AS ss_tot,
      |    sum(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) AS sum_si2_over_n
      |  FROM pg)
      |SELECT n_total, k,
      |  round(((sum_si2_over_n - CAST(s_tot AS DOUBLE) * CAST(s_tot AS DOUBLE) / n_total) / (k - 1)) /
      |    ((ss_tot - sum_si2_over_n) / (n_total - k)), 4) AS f_levene
      |FROM t""".stripMargin

  // ---------------------------------------------------------- ts_theil_sen

  /** Theil–Sen robust slope of daily revenue — the median of all
    * pairwise slopes, immune to the outlier days that drag
    * `q_forecast_linreg`'s OLS line. Same scale shape as
    * q_kendall_tau: the quadratic pair step runs over the AGGREGATED
    * daily series (bounded by calendar, not data volume). Each slope
    * is one division of exact longs (cents over days — IEEE-
    * deterministic), and the median uses the percentile ↔
    * quantile_cont parity. OLS slope rides along for the
    * robust-vs-classical comparison.
    */
  def tsTheilSen(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables(spark, dir).orders
      .groupBy(expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("y"))
    val slopes = daily.select($"day".as("d1"), $"y".as("y1"))
      .join(daily.select($"day".as("d2"), $"y".as("y2")), $"d1" < $"d2")
      // try_divide: Spark 4 fuses the BNLJ condition and this
      // projection into one codegen stage and can evaluate the
      // division on pairs the d1<d2 condition later rejects — a
      // plain ANSI divide then throws on the d1=d2 diagonal even
      // though no such row survives. try_divide is NULL there and
      // the join condition drops the row either way.
      .select(expr("try_divide(cast(y2 - y1 as double), cast(d2 - d1 as double))").as("slope"))
    // Exact median WITHOUT the built-in percentile aggregate: that
    // one funnels every distinct slope (≈ all of n_pairs) into a
    // single reducer's hash map — 11 s at sf0.1 and the classic
    // driver-side scale-killer. Instead: value-grouped counts, a
    // PrefixSum global running count (bucketed by floor(asinh·8) —
    // monotone, log-spaced, bounded), and selection of the two
    // order statistics the continuous-quantile definition needs.
    // The interpolation lo + (hi − lo)·0.5 is written EXACTLY as
    // both engines' quantile implementations compute it.
    val grouped = slopes.groupBy($"slope").agg(count(lit(1)).as("cnt"))
    val cum = graft.operators.PrefixSum.running(grouped, $"slope",
      floor(asinh($"slope") * 8).cast("long"), Seq("cnt" -> $"cnt"))
    val n = grouped.agg(sum($"cnt").as("np"))
    val med = cum.crossJoin(broadcast(n))
      .withColumn("lo", expr("(np - 1) div 2"))
      .withColumn("hi", expr("np div 2"))
      .filter(($"cum_cnt" - $"cnt" <= $"lo" && $"lo" < $"cum_cnt") ||
        ($"cum_cnt" - $"cnt" <= $"hi" && $"hi" < $"cum_cnt"))
      .agg(
        min(when($"cum_cnt" - $"cnt" <= $"lo" && $"lo" < $"cum_cnt", $"slope")).as("vlo"),
        min(when($"cum_cnt" - $"cnt" <= $"hi" && $"hi" < $"cum_cnt", $"slope")).as("vhi"))
      .select(round($"vlo" + ($"vhi" - $"vlo") * 0.5, 6).as("theil_sen_slope"))
    val ols = daily.agg(round(expr("regr_slope(cast(y as double), cast(day as double))"), 6)
      .as("ols_slope"))
    // n_pairs = C(n_days, 2) — arithmetic, not a second pair join
    daily.agg(count(lit(1)).as("n_days"))
      .crossJoin(broadcast(med))
      .crossJoin(broadcast(ols))
      .select($"n_days", ($"n_days" * ($"n_days" - 1) / 2).cast("long").as("n_pairs"),
        $"theil_sen_slope", $"ols_slope")
  }

  private val tsTheilSenSql =
    """WITH daily AS (
      |  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      |sl AS (
      |  SELECT CAST(b.y - a.y AS DOUBLE) / CAST(b.day - a.day AS DOUBLE) AS slope
      |  FROM daily a JOIN daily b ON a.day < b.day),
      |agg AS (
      |  SELECT round(quantile_cont(slope, 0.5), 6) AS theil_sen_slope
      |  FROM sl),
      |nd AS (SELECT count(*) AS n_days FROM daily),
      |ols AS (SELECT round(regr_slope(CAST(y AS DOUBLE), CAST(day AS DOUBLE)), 6) AS ols_slope FROM daily)
      |SELECT n_days, CAST(n_days * (n_days - 1) // 2 AS BIGINT) AS n_pairs,
      |  theil_sen_slope, ols_slope FROM agg, nd, ols""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("q_levene_test", qLeveneTest _, qLeveneTestSql),
    QueryDef.sql("ts_theil_sen", tsTheilSen _, tsTheilSenSql),
    QueryDef.sql("q_cramers_v", qCramersV _, qCramersVSql),
    QueryDef.sql("q_mutual_info", qMutualInfo _, qMutualInfoSql),
    QueryDef.sql("q_ols_multi", qOlsMulti _, qOlsMultiSql),
    QueryDef.sql("q_kendall_tau", qKendallTau _, qKendallTauSql))
}
