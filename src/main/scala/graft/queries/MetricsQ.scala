package graft.queries

import graft.Tables
import graft.functions.TextFns
import graft.operators.PrefixSum
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 wave O — model-evaluation metrics: the "did the filter /
  * classifier actually work" surface every training-data pipeline
  * needs before a quality model ships. The model under test is a
  * deterministic weak English detector (stopword-hit ratio, e4
  * quantized) scored against the `lang = 'en'` ground truth, so both
  * engines replay identical (score, label) pairs with no RNG.
  *
  * Scale design: every metric reduces over the DISTINCT-SCORE table
  * (≤ 10 001 rows by construction — scores are rounded ratios in
  * [0, 10000]), never over row-level data. Rank-dependent metrics
  * (AUC, PR curve) get their global cumulatives from the PrefixSum
  * bucket-offset scheme — no single-partition window over data-
  * cardinality rows. Real-valued terms quantize to integer nanos
  * before any cross-row sum (the mutual-info rule), so the gates
  * hash-match bit-for-bit.
  */
object MetricsQ {

  private val stops = Seq("the", "a", "and", "of", "to", "in", "is", "it")

  /** Stopword-hit ratio in [0,10000] — the deterministic "model score". */
  private def scoreE4(c: Column): Column = {
    val toks = TextFns.toks(c)
    round(lit(10000.0) * size(filter(toks, t => t.isin(stops: _*))) / size(toks))
      .cast("long")
  }

  private val scoreSql: String = {
    val t = QueryDef.toksSql()
    "CAST(round(10000.0 * len(list_filter(" + t +
      ", t -> t IN ('the','a','and','of','to','in','is','it'))) / len(" + t +
      ")) AS BIGINT)"
  }

  /** (score_e4, is_en) pairs — the shared scored-corpus input. */
  private def scored(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .select(scoreE4($"text").as("s"), ($"lang" === "en").as("y"))
  }

  /** Per-distinct-score class counts — the bounded metadata table all
    * rank metrics reduce over.
    */
  private def perScore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    scored(spark, dir).groupBy($"s")
      .agg(sum(when($"y", 1L).otherwise(0L)).as("c1"),
        sum(when($"y", 0L).otherwise(1L)).as("c0"))
  }

  private val perScoreSql: String =
    s"""d AS (SELECT $scoreSql AS s, lang = 'en' AS y FROM documents),
       |per AS (
       |  SELECT s,
       |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS c1,
       |    CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS c0
       |  FROM d GROUP BY s)""".stripMargin

  // ------------------------------------------------------------- q_roc_auc
  /** Exact tie-corrected ROC AUC from the rank-sum identity
    * (AUC = U/(n₁n₀), the Mann–Whitney relation): with value-grouped
    * counts, 2U = Σ_s c₁(s)·(2·cum₀(s⁻) + c₀(s)) — all integers, one
    * PrefixSum over the distinct-score table, one double division at
    * the end. Gini = 2·AUC − 1 rides along.
    */
  def qRocAuc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cum = PrefixSum.running(perScore(spark, dir), $"s",
      expr("s div 512"), Seq(("c0", $"c0")))
    cum
      .agg(sum($"c1").as("n1"), sum($"c0").as("n0"),
        sum($"c1" * (lit(2L) * ($"cum_c0" - $"c0") + $"c0")).as("u2"))
      .select(($"n1" + $"n0").as("n"), $"n1", $"n0",
        expr("round(CAST(u2 AS DOUBLE) / (2.0 * n1 * n0), 6)").as("auc"),
        expr("round(CAST(u2 AS DOUBLE) / (1.0 * n1 * n0) - 1.0, 6)").as("gini"))
  }

  private val qRocAucSql =
    s"""WITH $perScoreSql,
       |c AS (
       |  SELECT s, c1, c0,
       |    CAST(sum(c0) OVER (ORDER BY s) AS BIGINT) AS cum_c0
       |  FROM per),
       |t AS (
       |  SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c0) AS BIGINT) AS n0,
       |    CAST(sum(c1 * (2 * (cum_c0 - c0) + c0)) AS BIGINT) AS u2
       |  FROM c)
       |SELECT n1 + n0 AS n, n1, n0,
       |  round(CAST(u2 AS DOUBLE) / (2.0 * n1 * n0), 6) AS auc,
       |  round(CAST(u2 AS DOUBLE) / (1.0 * n1 * n0) - 1.0, 6) AS gini
       |FROM t""".stripMargin

  // ------------------------------------------------------------ q_pr_curve
  /** Precision/recall/F1 at every distinct threshold (predict positive
    * when score ≥ s), descending-cumulative TP/FP from PrefixSum over
    * the negated score, plus step-wise average precision
    * AP = Σ_s (Δrecall)·precision as a broadcast nano-quantized sum.
    */
  def qPrCurve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val neg = perScore(spark, dir).withColumn("negs", -$"s")
    val cum = PrefixSum.running(neg, $"negs", expr("negs div 512"),
      Seq(("c1", $"c1"), ("c0", $"c0")))
    val tot = cum.agg(sum($"c1").as("n1"))
    val t = cum.crossJoin(broadcast(tot))
      .select($"s", $"c1", $"n1", $"cum_c1".as("tp"), $"cum_c0".as("fp"))
    val ap = t.select(expr(
        "CAST(round(1e9 * c1 * (CAST(tp AS DOUBLE) / (tp + fp)) / n1) AS BIGINT)")
        .as("ap_term"))
      .agg(sum($"ap_term").as("ap_e9"))
    t.crossJoin(broadcast(ap))
      .select($"s", $"tp", $"fp",
        expr("round(CAST(tp AS DOUBLE) / (tp + fp), 6)").as("prec"),
        expr("round(CAST(tp AS DOUBLE) / n1, 6)").as("rec"),
        // 2 * CAST(...): a bare 2.0 literal is DECIMAL in Spark SQL and
        // would force the whole quotient into decimal (object dtype)
        expr("round(2 * CAST(tp AS DOUBLE) / (tp + fp + n1), 6)").as("f1"),
        expr("round(ap_e9 / 1e9, 6)").as("avg_precision"))
      .orderBy($"s".desc)
  }

  private val qPrCurveSql =
    s"""WITH $perScoreSql,
       |c AS (
       |  SELECT s, c1,
       |    CAST(sum(c1) OVER (ORDER BY s DESC) AS BIGINT) AS tp,
       |    CAST(sum(c0) OVER (ORDER BY s DESC) AS BIGINT) AS fp
       |  FROM per),
       |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1 FROM per),
       |ap AS (
       |  SELECT CAST(sum(CAST(round(1e9 * c1 * (CAST(tp AS DOUBLE) / (tp + fp)) / n1)
       |    AS BIGINT)) AS BIGINT) AS ap_e9
       |  FROM c, tot)
       |SELECT s, tp, fp,
       |  round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS prec,
       |  round(CAST(tp AS DOUBLE) / n1, 6) AS rec,
       |  round(2 * CAST(tp AS DOUBLE) / (tp + fp + n1), 6) AS f1,
       |  round(ap_e9 / 1e9, 6) AS avg_precision
       |FROM c, tot, ap ORDER BY s DESC""".stripMargin

  // --------------------------------------------------------- q_calibration
  /** Reliability diagram: 10 equal-width confidence bins, mean
    * predicted probability vs empirical positive rate per bin, and the
    * expected calibration error ECE = Σ_b (n_b/n)·|acc_b − conf_b|
    * (nano-quantized terms). Bin stats are exact integer sums.
    */
  def qCalibration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bins = scored(spark, dir)
      .withColumn("bin", expr("least(s div 1000, 9)"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("nb"),
        sum(when($"y", 1L).otherwise(0L)).as("pos"),
        sum($"s").as("ssum"))
    val tot = bins.agg(sum($"nb").as("n"))
    val t = bins.crossJoin(broadcast(tot))
    val ece = t.select(expr(
        """CAST(round(abs(CAST(pos AS DOUBLE) / nb -
          |CAST(ssum AS DOUBLE) / nb / 10000.0) * nb * 1e9 / n) AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("term"))
      .agg(sum($"term").as("ece_e9"))
    t.crossJoin(broadcast(ece))
      .select($"bin", $"nb", $"pos",
        expr("round(CAST(ssum AS DOUBLE) / nb / 10000.0, 6)").as("conf"),
        expr("round(CAST(pos AS DOUBLE) / nb, 6)").as("acc"),
        expr("round(ece_e9 / 1e9, 6)").as("ece"))
      .orderBy($"bin")
  }

  private val qCalibrationSql =
    s"""WITH d AS (SELECT $scoreSql AS s, lang = 'en' AS y FROM documents),
       |b AS (
       |  SELECT least(s // 1000, 9) AS bin, count(*) AS nb,
       |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS pos,
       |    CAST(sum(s) AS BIGINT) AS ssum
       |  FROM d GROUP BY 1),
       |tot AS (SELECT CAST(sum(nb) AS BIGINT) AS n FROM b),
       |e AS (
       |  SELECT CAST(sum(CAST(round(abs(CAST(pos AS DOUBLE) / nb -
       |    CAST(ssum AS DOUBLE) / nb / 10000.0) * nb * 1e9 / n) AS BIGINT)) AS BIGINT)
       |    AS ece_e9
       |  FROM b, tot)
       |SELECT bin, nb, pos,
       |  round(CAST(ssum AS DOUBLE) / nb / 10000.0, 6) AS conf,
       |  round(CAST(pos AS DOUBLE) / nb, 6) AS acc,
       |  round(ece_e9 / 1e9, 6) AS ece
       |FROM b, tot, e ORDER BY bin""".stripMargin

  // --------------------------------------------------- q_confusion_metrics
  /** Confusion matrix at a fixed operating point (score ≥ 1500) plus
    * accuracy / precision / recall / F1 / Matthews correlation — one
    * map-side-combinable aggregate row; every metric is a single
    * deterministic expression over the four integer cells.
    */
  def qConfusionMetrics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    scored(spark, dir)
      .agg(
        sum(when($"y" && $"s" >= 1500, 1L).otherwise(0L)).as("tp"),
        sum(when(!$"y" && $"s" >= 1500, 1L).otherwise(0L)).as("fp"),
        sum(when($"y" && $"s" < 1500, 1L).otherwise(0L)).as("fn"),
        sum(when(!$"y" && $"s" < 1500, 1L).otherwise(0L)).as("tn"))
      .select($"tp", $"fp", $"fn", $"tn",
        expr("round(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6)").as("acc"),
        expr("round(CAST(tp AS DOUBLE) / nullif(tp + fp, 0), 6)").as("prec"),
        expr("round(CAST(tp AS DOUBLE) / nullif(tp + fn, 0), 6)").as("rec"),
        expr("round(2 * CAST(tp AS DOUBLE) / nullif(2 * tp + fp + fn, 0), 6)").as("f1"),
        expr("""round((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn) /
          |nullif(sqrt(CAST(tp + fp AS DOUBLE) * (tp + fn) * (tn + fp) * (tn + fn)), 0.0), 6)"""
          .stripMargin.replace("\n", " ")).as("mcc"))
  }

  private val qConfusionMetricsSql =
    s"""WITH d AS (SELECT $scoreSql AS s, lang = 'en' AS y FROM documents),
       |m AS (
       |  SELECT
       |    CAST(sum(CASE WHEN y AND s >= 1500 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |    CAST(sum(CASE WHEN NOT y AND s >= 1500 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |    CAST(sum(CASE WHEN y AND s < 1500 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |    CAST(sum(CASE WHEN NOT y AND s < 1500 THEN 1 ELSE 0 END) AS BIGINT) AS tn
       |  FROM d)
       |SELECT tp, fp, fn, tn,
       |  round(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6) AS acc,
       |  round(CAST(tp AS DOUBLE) / nullif(tp + fp, 0), 6) AS prec,
       |  round(CAST(tp AS DOUBLE) / nullif(tp + fn, 0), 6) AS rec,
       |  round(2 * CAST(tp AS DOUBLE) / nullif(2 * tp + fp + fn, 0), 6) AS f1,
       |  round((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn) /
       |    nullif(sqrt(CAST(tp + fp AS DOUBLE) * (tp + fn) * (tn + fp) * (tn + fn)), 0.0), 6) AS mcc
       |FROM m""".stripMargin

  // ------------------------------------------------------------ q_log_loss
  /** Cross-entropy and Brier score of the probabilistic read of the
    * score (p = s/10⁴ clamped to [1e-6, 1−1e-6]) — per-row terms
    * nano-quantize before the sum, so the reduction is exact longs.
    */
  def qLogLoss(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    scored(spark, dir)
      .select($"y",
        expr("greatest(1e-6, least(1.0 - 1e-6, CAST(s AS DOUBLE) / 10000.0))").as("p"))
      .select(
        expr("CAST(round((CASE WHEN y THEN -ln(p) ELSE -ln(1.0 - p) END) * 1e9) AS BIGINT)")
          .as("ll_term"),
        expr("CAST(round(pow(p - (CASE WHEN y THEN 1.0 ELSE 0.0 END), 2) * 1e9) AS BIGINT)")
          .as("br_term"))
      .agg(count(lit(1)).as("n"),
        sum($"ll_term").as("ll_e9"), sum($"br_term").as("br_e9"))
      .select($"n",
        expr("round(ll_e9 / 1e9 / n, 6)").as("log_loss"),
        expr("round(br_e9 / 1e9 / n, 6)").as("brier"))
  }

  private val qLogLossSql =
    s"""WITH d AS (SELECT $scoreSql AS s, lang = 'en' AS y FROM documents),
       |p AS (
       |  SELECT y,
       |    greatest(1e-6, least(1.0 - 1e-6, CAST(s AS DOUBLE) / 10000.0)) AS p
       |  FROM d),
       |t AS (
       |  SELECT count(*) AS n,
       |    CAST(sum(CAST(round((CASE WHEN y THEN -ln(p) ELSE -ln(1.0 - p) END) * 1e9)
       |      AS BIGINT)) AS BIGINT) AS ll_e9,
       |    CAST(sum(CAST(round(pow(p - (CASE WHEN y THEN 1.0 ELSE 0.0 END), 2) * 1e9)
       |      AS BIGINT)) AS BIGINT) AS br_e9
       |  FROM p)
       |SELECT n, round(ll_e9 / 1e9 / n, 6) AS log_loss,
       |  round(br_e9 / 1e9 / n, 6) AS brier
       |FROM t""".stripMargin

  // ---------------------------------------------------------------- registry

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("q_roc_auc", qRocAuc _, qRocAucSql),
    QueryDef.sql("q_pr_curve", qPrCurve _, qPrCurveSql),
    QueryDef.sql("q_calibration", qCalibration _, qCalibrationSql),
    QueryDef.sql("q_confusion_metrics", qConfusionMetrics _, qConfusionMetricsSql),
    QueryDef.sql("q_log_loss", qLogLoss _, qLogLossSql))
}
