package graft.queries

import graft.Tables
import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-7 wave W — statistical rigor: Jarque–Bera normality (the
  * assumption check behind every t/z gate), McNemar's paired test
  * between the two deterministic raters (the significance companion
  * of `q_cohens_kappa`), and a differentially-private histogram
  * release with md5-replayable Laplace noise — the privacy tier above
  * `etl_k_anonymize` (suppression) and `etl_pseudonymize` (tokens).
  *
  * Scale design: each gate reduces 100 TB to group-cardinality
  * sufficient statistics map-side; higher central moments accumulate
  * in decimal(38,0) (DuckDB's hugeint twin) so the only doubles are
  * final-mile expressions on exact integers.
  */
object RigorQ {

  // ------------------------------------------------------------ q_jarque_bera
  /** Jarque–Bera normality test of order value per priority stratum.
    * Two passes (the q17 pre-aggregated-broadcast pattern): pass 1
    * yields an integer dollar pivot μ = Σx div n per group (broadcast
    * — group cardinality), pass 2 folds Σ(x−μ)^{2,3,4} map-side with
    * the cube/quartic in decimal(38,0) — (6e5)⁴ per row overflows
    * BIGINT but not hugeint. Skewness g1 = √n·M3/M2^1.5 and excess
    * kurtosis g2 = n·M4/M2²−3 are single double expressions on exact
    * decimals; JB = n(g1²/6 + g2²/24) against the χ²₂ 95% cut.
    */
  def qJarqueBera(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables(spark, dir).orders
      .select($"o_orderpriority",
        expr("CAST(round(o_totalprice * 100) AS BIGINT) div 100").as("d"))
    val pivot = o.groupBy($"o_orderpriority")
      .agg(expr("sum(d) div count(1)").as("mu"))
    val dev = o.join(broadcast(pivot), "o_orderpriority")
      .withColumn("v", $"d" - $"mu")
    dev.groupBy($"o_orderpriority", $"mu")
      .agg(count(lit(1)).as("n"),
        sum($"v".cast(DecimalType(38, 0)) * $"v").as("m2"),
        sum($"v".cast(DecimalType(38, 0)) * $"v" * $"v").as("m3"),
        sum($"v".cast(DecimalType(38, 0)) * $"v" * $"v" * $"v").as("m4"))
      .withColumn("sk", expr(
        "sqrt(CAST(n AS DOUBLE)) * CAST(m3 AS DOUBLE) / (CAST(m2 AS DOUBLE) * sqrt(CAST(m2 AS DOUBLE)))"))
      .withColumn("ku", expr(
        "n * CAST(m4 AS DOUBLE) / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)) - 3.0"))
      .select($"o_orderpriority", $"n", $"mu".as("mu_dollars"),
        expr("round(sk, 6)").as("skewness"),
        expr("round(ku, 6)").as("ex_kurtosis"),
        expr("round(n * (sk * sk / 6.0 + ku * ku / 24.0), 4)").as("jb"),
        expr("round(n * (sk * sk / 6.0 + ku * ku / 24.0), 4) > 5.9915").as("normal_rejected"))
      .orderBy($"o_orderpriority")
  }

  private val qJarqueBeraSql =
    """WITH o AS (
      |  SELECT o_orderpriority,
      |    CAST(round(o_totalprice * 100) AS BIGINT) // 100 AS d
      |  FROM orders),
      |p AS (
      |  SELECT o_orderpriority, CAST(sum(d) AS BIGINT) // count(*) AS mu
      |  FROM o GROUP BY 1),
      |v AS (
      |  SELECT o.o_orderpriority, mu, d - mu AS v
      |  FROM o JOIN p ON o.o_orderpriority = p.o_orderpriority),
      |m AS (
      |  SELECT o_orderpriority, mu, count(*) AS n,
      |    sum(CAST(v AS HUGEINT) * v) AS m2,
      |    sum(CAST(v AS HUGEINT) * v * v) AS m3,
      |    sum(CAST(v AS HUGEINT) * v * v * v) AS m4
      |  FROM v GROUP BY 1, 2),
      |s AS (
      |  SELECT *,
      |    sqrt(CAST(n AS DOUBLE)) * CAST(m3 AS DOUBLE) / (CAST(m2 AS DOUBLE) * sqrt(CAST(m2 AS DOUBLE))) AS sk,
      |    n * CAST(m4 AS DOUBLE) / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)) - 3.0 AS ku
      |  FROM m)
      |SELECT o_orderpriority, n, mu AS mu_dollars,
      |  round(sk, 6) AS skewness,
      |  round(ku, 6) AS ex_kurtosis,
      |  round(n * (sk * sk / 6.0 + ku * ku / 24.0), 4) AS jb,
      |  round(n * (sk * sk / 6.0 + ku * ku / 24.0), 4) > 5.9915 AS normal_rejected
      |FROM s ORDER BY o_orderpriority""".stripMargin

  // --------------------------------------------------------------- q_mcnemar
  /** McNemar's test on the paired disagreements of the two
    * deterministic English raters from `q_cohens_kappa` (stopword-hit
    * vs ASCII-letter-fraction): kappa measures agreement, McNemar asks
    * whether the DISAGREEMENTS are systematically one-sided — the
    * right paired test when both raters saw the same documents. Only
    * the off-diagonal cells matter; continuity-corrected
    * χ² = (|b−c|−1)²/(b+c), all integers until the one division.
    */
  def qMcnemar(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = TextFns.toks($"text")
    val stops = Seq("the", "a", "and", "of", "to", "in", "is", "it")
    val d = Tables(spark, dir).documents.select(
      (size(filter(toks, t => t.isin(stops: _*))) * 10000 >= size(toks) * 1500)
        .as("ra"),
      (expr("length(regexp_replace(text, '[^A-Za-z]', ''))") * 100 >=
        expr("length(text)") * 55).as("rb"))
    d.agg(count(lit(1)).as("n"),
        sum(when($"ra" && !$"rb", 1L).otherwise(0L)).as("b"),
        sum(when(!$"ra" && $"rb", 1L).otherwise(0L)).as("c"))
      .select($"n", $"b", $"c",
        expr("""CASE WHEN b + c > 0 THEN
          |round(CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE) / (b + c), 6) END"""
          .stripMargin.replace("\n", " ")).as("mcnemar_chi2"),
        expr("""CASE WHEN b + c > 0 THEN
          |round(CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE) / (b + c), 6) > 3.8415 END"""
          .stripMargin.replace("\n", " ")).as("one_sided_bias"))
  }

  private val qMcnemarSql = {
    val t = QueryDef.toksSql()
    s"""WITH d AS (
       |  SELECT
       |    len(list_filter($t, t -> t IN ('the','a','and','of','to','in','is','it'))) * 10000
       |      >= len($t) * 1500 AS ra,
       |    length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 100 >= length(text) * 55 AS rb
       |  FROM documents),
       |m AS (
       |  SELECT count(*) AS n,
       |    CAST(sum(CASE WHEN ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT) AS b,
       |    CAST(sum(CASE WHEN NOT ra AND rb THEN 1 ELSE 0 END) AS BIGINT) AS c
       |  FROM d)
       |SELECT n, b, c,
       |  CASE WHEN b + c > 0 THEN round(CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE) / (b + c), 6) END AS mcnemar_chi2,
       |  CASE WHEN b + c > 0 THEN round(CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE) / (b + c), 6) > 3.8415 END AS one_sided_bias
       |FROM m""".stripMargin
  }

  // ---------------------------------------------------------- q_dp_histogram
  /** ε-differentially-private histogram release of event-type counts
    * (ε = 0.5, sensitivity 1): each released cell gets Laplace(1/ε)
    * noise derived by inverse CDF from an md5 uniform on the CELL KEY
    * — deterministic, partition/retry-stable, and exactly replayable
    * by the oracle (the q_permutation_test recipe applied to noise
    * instead of labels). The gate publishes true count, e6-quantized
    * noise and the released noisy count side by side — the
    * calibration view; a production release drops the true column.
    * Row-level DP: a user-level release bounds per-user contribution
    * first (`corpus_domain_cap` is that machinery). Noise is one
    * scalar expression per RELEASED CELL (group cardinality), never
    * per row; the ln result is e6-quantized before integer rounding
    * (the q_mutual_info ln discipline).
    */
  def qDpHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = Tables(spark, dir).events
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
    g.withColumn("u",
        conv(substring(md5(concat(lit("dp1:"), $"event_type")), 1, 13), 16, 10)
          .cast("long").cast("double") / lit(4503599627370496.0))
      .withColumn("lap_e6",
        expr("""CAST(round(1e6 * (CASE WHEN u < 0.5 THEN 2.0 ELSE -2.0 END) *
          |ln(greatest(1.0 - 2.0 * abs(u - 0.5), 2.220446049250313e-16))) AS BIGINT)"""
          .stripMargin.replace("\n", " ")))
      .select($"event_type", $"n",
        $"lap_e6",
        ($"n" + expr("CAST(round(lap_e6 / 1e6) AS BIGINT)")).as("released_n"),
        abs(expr("CAST(round(lap_e6 / 1e6) AS BIGINT)")).as("abs_err"),
        lit(0.5).as("epsilon"))
      .orderBy($"event_type")
  }

  private val qDpHistogramSql =
    """WITH g AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
      |u AS (
      |  SELECT *, CAST(('0x' || substr(md5('dp1:' || event_type), 1, 13)) AS BIGINT)
      |    / 4503599627370496.0 AS u
      |  FROM g),
      |l AS (
      |  SELECT *, CAST(round(1e6 * (CASE WHEN u < 0.5 THEN 2.0 ELSE -2.0 END) *
      |    ln(greatest(1.0 - 2.0 * abs(u - 0.5), 2.220446049250313e-16))) AS BIGINT) AS lap_e6
      |  FROM u)
      |SELECT event_type, n, lap_e6,
      |  n + CAST(round(lap_e6 / 1e6) AS BIGINT) AS released_n,
      |  abs(CAST(round(lap_e6 / 1e6) AS BIGINT)) AS abs_err,
      |  0.5 AS epsilon
      |FROM l ORDER BY event_type""".stripMargin

  // --------------------------------------------------------- ts_mann_kendall
  /** Mann–Kendall trend test of daily order counts — the standard
    * nonparametric "is this series trending" monitor (the trend
    * sibling of `q_kendall_tau`, which correlates two METRICS; MK
    * correlates one metric with TIME). S = Σ sgn(y₂−y₁) over day
    * pairs runs on the AGGREGATED series (calendar-bounded — the
    * etl_binpack quadratic rule); the tie-corrected variance
    * numerator n(n−1)(2n+5) − Σt(t−1)(2t+5) stays exact long
    * arithmetic, and the continuity-corrected Z is the one final
    * double expression. |Z| > 1.96 flags the direction.
    */
  def tsMannKendall(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables(spark, dir).orders
      .groupBy(expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("day"))
      .agg(count(lit(1)).as("y"))
    val s = daily.select($"day".as("d1"), $"y".as("y1"))
      .join(daily.select($"day".as("d2"), $"y".as("y2")), $"d1" < $"d2")
      .agg(sum(when($"y2" > $"y1", 1L).when($"y2" < $"y1", -1L).otherwise(0L)).as("s"))
    val ties = daily.groupBy($"y").agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(expr("t * (t - 1) * (2 * t + 5)")), lit(0L)).as("tie_term"))
    val n = daily.agg(count(lit(1)).as("n"))
    s.crossJoin(broadcast(ties)).crossJoin(broadcast(n))
      .withColumn("var_num", expr("n * (n - 1) * (2 * n + 5) - tie_term"))
      .select($"n".as("n_days"), $"s".as("s_stat"), $"var_num",
        expr("""round(CASE WHEN s > 0 THEN (s - 1) / sqrt(var_num / 18.0)
          |WHEN s < 0 THEN (s + 1) / sqrt(var_num / 18.0) ELSE 0.0 END, 4)"""
          .stripMargin.replace("\n", " ")).as("z"),
        expr("""CASE WHEN round(CASE WHEN s > 0 THEN (s - 1) / sqrt(var_num / 18.0)
          |WHEN s < 0 THEN (s + 1) / sqrt(var_num / 18.0) ELSE 0.0 END, 4) > 1.96 THEN 'increasing'
          |WHEN round(CASE WHEN s > 0 THEN (s - 1) / sqrt(var_num / 18.0)
          |WHEN s < 0 THEN (s + 1) / sqrt(var_num / 18.0) ELSE 0.0 END, 4) < -1.96 THEN 'decreasing'
          |ELSE 'none' END""".stripMargin.replace("\n", " ")).as("trend"))
  }

  private val tsMannKendallSql =
    """WITH daily AS (
      |  SELECT epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS day,
      |    count(*) AS y
      |  FROM orders GROUP BY 1),
      |s AS (
      |  SELECT CAST(sum(CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s
      |  FROM daily a JOIN daily b ON a.day < b.day),
      |ties AS (
      |  SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie_term
      |  FROM (SELECT y, count(*) AS t FROM daily GROUP BY y)),
      |n AS (SELECT count(*) AS n FROM daily),
      |v AS (SELECT s, tie_term, n, n * (n - 1) * (2 * n + 5) - tie_term AS var_num
      |      FROM s, ties, n)
      |SELECT n AS n_days, s AS s_stat, var_num,
      |  round(CASE WHEN s > 0 THEN (s - 1) / sqrt(var_num / 18.0)
      |    WHEN s < 0 THEN (s + 1) / sqrt(var_num / 18.0) ELSE 0.0 END, 4) AS z,
      |  CASE WHEN round(CASE WHEN s > 0 THEN (s - 1) / sqrt(var_num / 18.0)
      |    WHEN s < 0 THEN (s + 1) / sqrt(var_num / 18.0) ELSE 0.0 END, 4) > 1.96 THEN 'increasing'
      |  WHEN round(CASE WHEN s > 0 THEN (s - 1) / sqrt(var_num / 18.0)
      |    WHEN s < 0 THEN (s + 1) / sqrt(var_num / 18.0) ELSE 0.0 END, 4) < -1.96 THEN 'decreasing'
      |  ELSE 'none' END AS trend
      |FROM v""".stripMargin

  // -------------------------------------------------------- q_weighted_median
  /** Weighted median of unit price (cents) per return flag, weights =
    * line quantity — the robust "typical traded price" a plain median
    * misrepresents when line sizes vary. Value-grouped weights first
    * (state = distinct prices per flag, not rows), then one
    * PARTITIONED running-weight window over that value table; the
    * median is the smallest value whose doubled cumulative weight
    * reaches the total — integer comparisons end to end.
    */
  def qWeightedMedian(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vg = Tables(spark, dir).lineitem
      .select($"l_returnflag".as("flag"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
        expr("CAST(l_quantity AS BIGINT)").as("q"))
      .groupBy($"flag", $"cents").agg(sum($"q").as("w"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy($"flag").orderBy($"cents")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    vg.withColumn("cum", sum($"w").over(win))
      .withColumn("tot", sum($"w").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"flag")))
      .groupBy($"flag")
      .agg(count(lit(1)).as("n_values"),
        max($"tot").as("total_weight"),
        min(when($"cum" * 2 >= $"tot", $"cents")).as("w_median_cents"))
      .orderBy($"flag")
  }

  private val qWeightedMedianSql =
    """WITH vg AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
      |  FROM lineitem GROUP BY 1, 2),
      |c AS (
      |  SELECT *, CAST(sum(w) OVER (PARTITION BY flag ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |    CAST(sum(w) OVER (PARTITION BY flag) AS BIGINT) AS tot
      |  FROM vg)
      |SELECT flag, count(*) AS n_values, max(tot) AS total_weight,
      |  min(CASE WHEN cum * 2 >= tot THEN cents END) AS w_median_cents
      |FROM c GROUP BY flag ORDER BY flag""".stripMargin

  // ---------------------------------------------------------------- registry

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("q_jarque_bera", qJarqueBera _, qJarqueBeraSql),
    QueryDef.sql("q_mcnemar", qMcnemar _, qMcnemarSql),
    QueryDef.sql("q_dp_histogram", qDpHistogram _, qDpHistogramSql),
    QueryDef.sql("ts_mann_kendall", tsMannKendall _, tsMannKendallSql),
    QueryDef.sql("q_weighted_median", qWeightedMedian _, qWeightedMedianSql))
}
