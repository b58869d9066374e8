package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 wave 4 — segmentation and dependence analytics: a
  * chi-square independence test, frequent event-trigram mining and
  * RFM customer segmentation. Sufficient-statistics shapes
  * throughout: integer contingency cells, lag-window n-grams,
  * percentile fences.
  */
object SegmentQ {

  /** Chi-square independence test of event type × user-parity cohort:
    * the categorical sibling of `q_ab_test`. The contingency table is
    * ONE map-side-combinable aggregate (types × 2 integer cells);
    * expected counts and per-cell χ² contributions compute from exact
    * integers, each contribution quantizes to integer ten-thousandths
    * BEFORE the cross-cell sum (the q_ab_test recipe), so the
    * statistic is bit-identical on both engines.
    */
  def qCrosstabChi2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val observed = Tables(spark, dir).events
      .groupBy($"event_type", ($"user_id" % 2 === 0).as("cohort_a"))
      .agg(count(lit(1)).as("o"))
    // fill EMPTY cells explicitly — a groupBy-only table omits them,
    // silently understating chi² on sparse contingencies (the zero
    // cells carry e worth of evidence each)
    val cells = observed.select($"event_type").distinct()
      .crossJoin(observed.select($"cohort_a").distinct())
      .join(observed, Seq("event_type", "cohort_a"), "left")
      .withColumn("o", coalesce($"o", lit(0L)))
    val margins = cells
      .withColumn("row_n", sum($"o").over(Window.partitionBy($"event_type")))
      .withColumn("col_n", sum($"o").over(Window.partitionBy($"cohort_a")))
      .crossJoin(broadcast(cells.agg(sum($"o").as("total"))))
    val contrib = margins
      .withColumn("e", $"row_n" * $"col_n" / $"total")
      .withColumn("c1e4",
        round(($"o" - $"e") * ($"o" - $"e") / $"e" * 10000).cast("long"))
    contrib.agg(
        sum($"o").as("n_events"),
        countDistinct($"event_type").as("n_types"),
        round(sum($"c1e4") / 10000.0, 4).as("chi2"))
      .select($"n_events", $"n_types",
        ($"n_types" - 1).as("dof"), $"chi2")
  }

  private val qCrosstabChi2Sql =
    """WITH observed AS (
      |  SELECT event_type, user_id % 2 = 0 AS cohort_a, count(*) AS o
      |  FROM events GROUP BY 1, 2),
      |cells AS (
      |  SELECT t.event_type, c.cohort_a, coalesce(o.o, 0) AS o
      |  FROM (SELECT DISTINCT event_type FROM observed) t
      |  CROSS JOIN (SELECT DISTINCT cohort_a FROM observed) c
      |  LEFT JOIN observed o
      |    ON o.event_type = t.event_type AND o.cohort_a = c.cohort_a),
      |m AS (
      |  SELECT *,
      |    sum(o) OVER (PARTITION BY event_type) AS row_n,
      |    sum(o) OVER (PARTITION BY cohort_a) AS col_n,
      |    sum(o) OVER () AS total
      |  FROM cells),
      |c AS (
      |  SELECT o, event_type,
      |    CAST(round((o - row_n * col_n / total) * (o - row_n * col_n / total)
      |      / (row_n * col_n / total) * 10000) AS BIGINT) AS c1e4
      |  FROM m)
      |SELECT CAST(sum(o) AS BIGINT) AS n_events,
      |  count(DISTINCT event_type) AS n_types,
      |  count(DISTINCT event_type) - 1 AS dof,
      |  round(CAST(sum(c1e4) AS BIGINT) / 10000.0, 4) AS chi2
      |FROM c""".stripMargin

  /** Frequent event trigrams: the top-20 3-event sequences across
    * user streams — sequence mining's first rung above
    * `q_markov_transitions`' bigrams. Two lag windows over the one
    * user_id shuffle produce the trigram stream in place (no
    * explode), one aggregate counts, TakeOrderedAndProject keeps the
    * top-k. Output bounded by |states|³.
    */
  def qSequenceTrigrams(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
    Tables(spark, dir).events
      .select($"user_id", $"event_id", $"event_type".as("e3"))
      .withColumn("e2", lag($"e3", 1).over(w))
      .withColumn("e1", lag($"e3", 2).over(w))
      .filter($"e1".isNotNull)
      .groupBy($"e1", $"e2", $"e3").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"e1", $"e2", $"e3")
      .limit(20)
  }

  private val qSequenceTrigramsSql =
    """WITH t AS (
      |  SELECT user_id,
      |    lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY event_id) AS e1,
      |    lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS e2,
      |    event_type AS e3
      |  FROM events)
      |SELECT e1, e2, e3, count(*) AS n
      |FROM t WHERE e1 IS NOT NULL
      |GROUP BY e1, e2, e3
      |ORDER BY n DESC, e1, e2, e3 LIMIT 20""".stripMargin

  /** RFM segmentation: recency / frequency / monetary per purchasing
    * user, scored 1–3 by exact tercile fences and labeled. One
    * per-user aggregate (integer day recency via `div`, counts, cent
    * sums), one percentile aggregate to a six-number fence table
    * (broadcast — genuinely bounded), scoring in codegen. The fences
    * compare on identical interpolated doubles (q_percentiles
    * parity); monetary sums are integer cents.
    */
  def qRfmSegments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, dir).events.filter($"event_type" === "purchase")
    val maxDay = e.agg(max(expr("unix_micros(ts) div 86400000000")).as("d_max"))
    val peru = e.groupBy($"user_id")
      .agg(max(expr("unix_micros(ts) div 86400000000")).as("last_day"),
        count(lit(1)).as("frequency"),
        sum(round($"value" * 100).cast("long")).as("monetary_cents"))
      .crossJoin(broadcast(maxDay))
      .withColumn("recency_days", $"d_max" - $"last_day")
    val fences = peru.agg(
      expr("percentile(recency_days, cast(1 as double)/3)").as("r1"),
      expr("percentile(recency_days, cast(2 as double)/3)").as("r2"),
      expr("percentile(frequency, cast(1 as double)/3)").as("f1"),
      expr("percentile(frequency, cast(2 as double)/3)").as("f2"),
      expr("percentile(monetary_cents, cast(1 as double)/3)").as("m1"),
      expr("percentile(monetary_cents, cast(2 as double)/3)").as("m2"))
    peru.crossJoin(broadcast(fences))
      .select($"user_id", $"recency_days", $"frequency", $"monetary_cents",
        // low recency is GOOD: score descends as recency grows
        when($"recency_days" <= $"r1", 3L).when($"recency_days" <= $"r2", 2L)
          .otherwise(1L).as("r_score"),
        when($"frequency" > $"f2", 3L).when($"frequency" > $"f1", 2L)
          .otherwise(1L).as("f_score"),
        when($"monetary_cents" > $"m2", 3L).when($"monetary_cents" > $"m1", 2L)
          .otherwise(1L).as("m_score"))
      .withColumn("segment",
        when($"r_score" === 3 && $"f_score" === 3, "champion")
          .when($"r_score" >= 2 && $"f_score" >= 2, "loyal")
          .when($"r_score" === 1 && $"f_score" >= 2, "at_risk")
          .otherwise("casual"))
      .orderBy($"user_id")
  }

  private val qRfmSegmentsSql =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |mx AS (SELECT max(day) AS d_max FROM e),
      |peru AS (
      |  SELECT user_id, mx.d_max - max(day) AS recency_days,
      |    count(*) AS frequency,
      |    CAST(sum(cents) AS BIGINT) AS monetary_cents
      |  FROM e, mx GROUP BY user_id, mx.d_max),
      |f AS (
      |  SELECT quantile_cont(recency_days, CAST(1 AS DOUBLE)/3) AS r1,
      |    quantile_cont(recency_days, CAST(2 AS DOUBLE)/3) AS r2,
      |    quantile_cont(frequency, CAST(1 AS DOUBLE)/3) AS f1,
      |    quantile_cont(frequency, CAST(2 AS DOUBLE)/3) AS f2,
      |    quantile_cont(monetary_cents, CAST(1 AS DOUBLE)/3) AS m1,
      |    quantile_cont(monetary_cents, CAST(2 AS DOUBLE)/3) AS m2
      |  FROM peru),
      |s AS (
      |  SELECT user_id, recency_days, frequency, monetary_cents,
      |    CASE WHEN recency_days <= r1 THEN 3 WHEN recency_days <= r2 THEN 2
      |      ELSE 1 END AS r_score,
      |    CASE WHEN frequency > f2 THEN 3 WHEN frequency > f1 THEN 2
      |      ELSE 1 END AS f_score,
      |    CASE WHEN monetary_cents > m2 THEN 3 WHEN monetary_cents > m1 THEN 2
      |      ELSE 1 END AS m_score
      |  FROM peru, f)
      |SELECT user_id, recency_days, frequency, monetary_cents,
      |  CAST(r_score AS BIGINT) AS r_score, CAST(f_score AS BIGINT) AS f_score,
      |  CAST(m_score AS BIGINT) AS m_score,
      |  CASE WHEN r_score = 3 AND f_score = 3 THEN 'champion'
      |    WHEN r_score >= 2 AND f_score >= 2 THEN 'loyal'
      |    WHEN r_score = 1 AND f_score >= 2 THEN 'at_risk'
      |    ELSE 'casual' END AS segment
      |FROM s ORDER BY user_id""".stripMargin

  /** Quantile binning: each purchase lands in its event-type decile —
    * the generic feature-engineering discretizer (the fences are the
    * same exact-percentile machinery as winsorize/RFM, the bin
    * assignment one codegen comparison chain against a broadcast
    * 9-number-per-type table). Output: per (type, bin) counts and
    * integer-cent value sums — pure integers after the fence compare,
    * which runs on identical interpolated doubles in both engines.
    */
  def qDecileBins(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, dir).events
    val fences = e.groupBy($"event_type")
      .agg(expr("percentile(value, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")
        .as("fs"))
    // e6-quantized fence comparison: on EQUAL neighboring order
    // statistics Spark's (1−γ)·a + γ·a interpolation can land a±ulp
    // where DuckDB's a + γ·(b−a) is exactly a, flipping rows whose
    // value IS the fence (surfaced by the first recorded sf0.1
    // full-battery parity run — 3 rows of 1.5M). Values are 2-decimal
    // money, so rounding both sides at 1e-6 collapses the ulp noise
    // without moving any genuine comparison.
    e.join(broadcast(fences), "event_type")
      .withColumn("bin",
        (lit(1L) + expr("size(filter(fs, f -> round(value * 1e6) > round(f * 1e6)))")).cast("long"))
      .groupBy($"event_type", $"bin")
      .agg(count(lit(1)).as("n"),
        sum(round($"value" * 100).cast("long")).as("cents"))
      .orderBy($"event_type", $"bin")
  }

  private val qDecileBinsSql =
    """WITH f AS (
      |  SELECT event_type,
      |    quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS fs
      |  FROM events GROUP BY event_type)
      |SELECT e.event_type,
      |  CAST(1 + len(list_filter(f.fs, x -> round(e.value * 1e6) > round(x * 1e6))) AS BIGINT) AS bin,
      |  count(*) AS n,
      |  CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS cents
      |FROM events e JOIN f USING (event_type)
      |GROUP BY 1, 2 ORDER BY event_type, bin""".stripMargin

  /** Day-of-week seasonality of purchase revenue. The weekday derives
    * from integer epoch-day arithmetic (`(day + 4) % 7` — the epoch
    * fell on a Thursday) instead of each engine's calendar function,
    * whose week-start conventions differ (Spark counts Sunday = 1,
    * DuckDB Sunday = 0 — a classic silent cross-engine drift). One
    * map-side-combinable aggregate; the share divides exact cents.
    */
  def qWeekdaySeasonality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables(spark, dir).events
      .filter($"event_type" === "purchase")
      .groupBy(expr("(unix_micros(ts) div 86400000000 + 4) % 7").as("weekday"))
      .agg(count(lit(1)).as("n"),
        sum(round($"value" * 100).cast("long")).as("cents"))
    per.crossJoin(broadcast(per.agg(sum($"cents").as("total"))))
      .select($"weekday", $"n", $"cents",
        round($"cents" / $"total", 6).as("rev_share"))
      .orderBy($"weekday")
  }

  private val qWeekdaySeasonalitySql =
    """WITH per AS (
      |  SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS weekday,
      |    count(*) AS n,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |t AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM per)
      |SELECT weekday, n, cents, round(cents / total, 6) AS rev_share
      |FROM per, t ORDER BY weekday""".stripMargin

  /** Stickiness (DAU/MAU) per month — the engagement-quality ratio
    * next to q_rolling_dau's absolute counts. Numerator: mean of the
    * month's daily distinct-user counts; denominator: the month's
    * distinct users. Two count-distinct aggregates on integer
    * epoch-day/month keys (no calendar functions — the
    * q_weekday_seasonality rule); the ratio divides exact integers,
    * unrounded (deterministic IEEE — the text_readability lesson).
    */
  def qStickiness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, dir).events
      .select(expr("unix_micros(ts) div 86400000000").as("day"), $"user_id")
      .withColumn("month", expr("day div 30"))
    val daily = e.groupBy($"month", $"day")
      .agg(countDistinct($"user_id").as("dau"))
      .groupBy($"month")
      .agg(count(lit(1)).as("n_days"), sum($"dau").as("dau_sum"))
    val monthly = e.groupBy($"month")
      .agg(countDistinct($"user_id").as("mau"))
    daily.join(monthly, "month")
      .select($"month", $"n_days", $"dau_sum", $"mau",
        ($"dau_sum".cast("double") / $"n_days" / $"mau").as("stickiness"))
      .orderBy($"month")
  }

  private val qStickinessSql =
    """WITH e AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day, user_id FROM events),
      |m AS (SELECT day // 30 AS month, day, user_id FROM e),
      |daily AS (
      |  SELECT month, count(*) AS n_days,
      |    CAST(sum(dau) AS BIGINT) AS dau_sum
      |  FROM (SELECT month, day, count(DISTINCT user_id) AS dau
      |        FROM m GROUP BY 1, 2)
      |  GROUP BY month),
      |monthly AS (SELECT month, count(DISTINCT user_id) AS mau FROM m GROUP BY 1)
      |SELECT month, n_days, dau_sum, mau,
      |  CAST(dau_sum AS DOUBLE) / n_days / mau AS stickiness
      |FROM daily JOIN monthly USING (month)
      |ORDER BY month""".stripMargin

  /** Inter-purchase interval distribution: exact p25/median/p75 of
    * the day gaps between a user's consecutive purchases — the
    * repeat-behavior read that prices retention campaigns. One lag
    * window per user (the single user_id shuffle), gaps in exact
    * integer days, exact percentile interpolation on identical
    * integer inputs (the RFM fence parity precedent).
    */
  def qPurchaseIntervals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"day", $"event_id")
    val gaps = Tables(spark, dir).events
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id",
        expr("unix_micros(ts) div 86400000000").as("day"))
      .withColumn("gap", $"day" - lag($"day", 1).over(w))
      .filter($"gap".isNotNull)
    gaps.agg(count(lit(1)).as("n_gaps"),
      expr("percentile(gap, 0.25)").as("p25"),
      expr("percentile(gap, 0.5)").as("median"),
      expr("percentile(gap, 0.75)").as("p75"),
      max($"gap").as("max_gap"))
  }

  private val qPurchaseIntervalsSql =
    """WITH p AS (
      |  SELECT user_id, event_id, epoch_us(ts) // 86400000000 AS day
      |  FROM events WHERE event_type = 'purchase'),
      |g AS (
      |  SELECT day - lag(day) OVER (PARTITION BY user_id
      |    ORDER BY day, event_id) AS gap
      |  FROM p)
      |SELECT count(*) AS n_gaps,
      |  quantile_cont(gap, 0.25) AS p25,
      |  quantile_cont(gap, 0.5) AS median,
      |  quantile_cont(gap, 0.75) AS p75,
      |  max(gap) AS max_gap
      |FROM g WHERE gap IS NOT NULL""".stripMargin

  /** New-vs-returning actives per month: a user counts as "new" in
    * their first-seen month, "returning" after — the growth-
    * accounting read on any activity stream. First-seen is one
    * min-aggregate per user; the monthly split joins it back on the
    * user shuffle key. Integer epoch months, exact integer counts,
    * one unrounded division.
    */
  def qNewReturning(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val m = Tables(spark, dir).events
      .select($"user_id", expr("unix_micros(ts) div 86400000000 div 30").as("month"))
      .distinct()
    val firstSeen = m.groupBy($"user_id").agg(min($"month").as("first_month"))
    m.join(firstSeen, "user_id")
      .groupBy($"month")
      .agg(sum(when($"month" === $"first_month", 1L).otherwise(0L)).as("n_new"),
        sum(when($"month" =!= $"first_month", 1L).otherwise(0L)).as("n_returning"))
      .withColumn("returning_share",
        $"n_returning".cast("double") / ($"n_new" + $"n_returning"))
      .orderBy($"month")
  }

  private val qNewReturningSql =
    """WITH m AS (
      |  SELECT DISTINCT user_id,
      |    epoch_us(ts) // 86400000000 // 30 AS month
      |  FROM events),
      |f AS (SELECT user_id, min(month) AS first_month FROM m GROUP BY 1)
      |SELECT month,
      |  CAST(sum(CASE WHEN month = first_month THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
      |  CAST(sum(CASE WHEN month <> first_month THEN 1 ELSE 0 END) AS BIGINT) AS n_returning,
      |  CAST(sum(CASE WHEN month <> first_month THEN 1 ELSE 0 END) AS DOUBLE) /
      |    count(*) AS returning_share
      |FROM m JOIN f USING (user_id)
      |GROUP BY month ORDER BY month""".stripMargin

  /** Cohort LTV curves: cumulative revenue per purchase-cohort user
    * at each month offset — the unit-economics read over
    * q_retention_cohort's activity grid. First-purchase month per
    * user (one min-aggregate on the user shuffle), per-(cohort,
    * offset) integer-cent sums, a window partitioned BY COHORT over
    * the bounded offset axis, and a broadcast cohort-size table.
    * LTV divides exact integers twice, unrounded.
    */
  def qCohortLtv(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = Tables(spark, dir).events
      .filter($"event_type" === "purchase")
      .select($"user_id",
        expr("unix_micros(ts) div 86400000000 div 30").as("month"),
        round($"value" * 100).cast("long").as("cents"))
    val cohort = p.groupBy($"user_id").agg(min($"month").as("cohort"))
    val sizes = cohort.groupBy($"cohort").agg(count(lit(1)).as("cohort_users"))
    val per = p.join(cohort, "user_id")
      .groupBy($"cohort", ($"month" - $"cohort").as("offset"))
      .agg(sum($"cents").as("cents"))
    val w = Window.partitionBy($"cohort").orderBy($"offset")
      .rowsBetween(Window.unboundedPreceding, 0)
    per.withColumn("cum_cents", sum($"cents").over(w))
      .join(broadcast(sizes), "cohort")
      .select($"cohort", $"offset", $"cents", $"cum_cents", $"cohort_users",
        ($"cum_cents".cast("double") / $"cohort_users" / 100.0).as("ltv"))
      .orderBy($"cohort", $"offset")
  }

  private val qCohortLtvSql =
    """WITH p AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 // 30 AS month,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, min(month) AS cohort FROM p GROUP BY 1),
      |sz AS (SELECT cohort, count(*) AS cohort_users FROM c GROUP BY 1),
      |per AS (
      |  SELECT cohort, month - cohort AS "offset",
      |    CAST(sum(cents) AS BIGINT) AS cents
      |  FROM p JOIN c USING (user_id) GROUP BY 1, 2),
      |cum AS (
      |  SELECT cohort, "offset", cents,
      |    CAST(sum(cents) OVER (PARTITION BY cohort ORDER BY "offset"
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
      |  FROM per)
      |SELECT cohort, "offset", cents, cum_cents, cohort_users,
      |  CAST(cum_cents AS DOUBLE) / cohort_users / 100.0 AS ltv
      |FROM cum JOIN sz USING (cohort)
      |ORDER BY cohort, "offset"""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("q_cohort_ltv", qCohortLtv _, qCohortLtvSql),
    QueryDef.sql("q_new_returning", qNewReturning _, qNewReturningSql),
    QueryDef.sql("q_stickiness", qStickiness _, qStickinessSql),
    QueryDef.sql("q_purchase_intervals", qPurchaseIntervals _, qPurchaseIntervalsSql),
    QueryDef.sql("q_decile_bins", qDecileBins _, qDecileBinsSql),
    QueryDef.sql("q_weekday_seasonality", qWeekdaySeasonality _, qWeekdaySeasonalitySql),
    QueryDef.sql("q_crosstab_chi2", qCrosstabChi2 _, qCrosstabChi2Sql),
    QueryDef.sql("q_sequence_trigrams", qSequenceTrigrams _, qSequenceTrigramsSql),
    QueryDef.sql("q_rfm_segments", qRfmSegments _, qRfmSegmentsSql))
}
