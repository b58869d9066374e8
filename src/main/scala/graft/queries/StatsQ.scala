package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 wave 3 — statistical analytics: OLS trend fitting, an A/B
  * test statistic, a k-anonymity audit and a survival curve. Each is
  * one or two map-side-combinable aggregates — the sufficient-
  * statistics shapes that reduce 100 TB to a handful of moments
  * before any final-mile math happens.
  */
object StatsQ {

  /** Per-type OLS trend of daily revenue — forecasting's linear
    * baseline. The daily series aggregates map-side first (types ×
    * days rows with 4-decimal sums), the day index re-bases to the
    * series start (the intercept then means "fitted revenue on day
    * 0" instead of an extrapolation to the epoch, which would
    * amplify last-bit noise 19,000 days out), and
    * `regr_slope`/`regr_intercept`/`regr_r2` reduce each series to
    * sufficient statistics in one pass — both engines implement the
    * same co-moment definitions (the q_corr_stats parity precedent).
    */
  def qForecastLinreg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables(spark, dir).events
      .groupBy($"event_type", expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(round(sum($"value"), 4).as("rev"))
    val day0 = daily.agg(min($"day").as("day0"))
    daily.crossJoin(broadcast(day0))
      .withColumn("d", $"day" - $"day0")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        round(expr("regr_slope(rev, d)"), 4).as("slope"),
        round(expr("regr_intercept(rev, d)"), 4).as("intercept"),
        round(expr("regr_r2(rev, d)"), 4).as("r2"))
      .orderBy($"event_type")
  }

  private val qForecastLinregSql =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    round(sum(value), 4) AS rev
      |  FROM events GROUP BY 1, 2),
      |d0 AS (SELECT min(day) AS day0 FROM daily)
      |SELECT event_type, count(*) AS n_days,
      |  round(regr_slope(rev, day - day0), 4) AS slope,
      |  round(regr_intercept(rev, day - day0), 4) AS intercept,
      |  round(regr_r2(rev, day - day0), 4) AS r2
      |FROM daily, d0 GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Welch's t statistic between two user cohorts (even vs odd
    * user_id) on purchase value — the experimentation primitive. ONE
    * conditional aggregate produces both cohorts' count/mean/variance
    * (map-side combinable — 100 TB reduces to six numbers), each
    * ROUNDED to 4 decimals before the t arithmetic, so the final
    * expression runs on identical inputs in both engines and the
    * division/sqrt are bit-deterministic.
    */
  def qAbTest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stats = Tables(spark, dir).events
      .filter($"event_type" === "purchase")
      .withColumn("a", $"user_id" % 2 === 0)
      .agg(
        sum(when($"a", 1L).otherwise(0L)).as("n_a"),
        sum(when(!$"a", 1L).otherwise(0L)).as("n_b"),
        round(avg(when($"a", $"value")), 4).as("mean_a"),
        round(avg(when(!$"a", $"value")), 4).as("mean_b"),
        round(var_samp(when($"a", $"value")), 4).as("var_a"),
        round(var_samp(when(!$"a", $"value")), 4).as("var_b"))
    stats.select($"n_a", $"n_b", $"mean_a", $"mean_b",
      round(($"mean_a" - $"mean_b") /
        sqrt($"var_a" / $"n_a" + $"var_b" / $"n_b"), 4).as("t_stat"))
  }

  private val qAbTestSql =
    """WITH s AS (
      |  SELECT
      |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    round(avg(CASE WHEN user_id % 2 = 0 THEN value END), 4) AS mean_a,
      |    round(avg(CASE WHEN user_id % 2 <> 0 THEN value END), 4) AS mean_b,
      |    round(var_samp(CASE WHEN user_id % 2 = 0 THEN value END), 4) AS var_a,
      |    round(var_samp(CASE WHEN user_id % 2 <> 0 THEN value END), 4) AS var_b
      |  FROM events WHERE event_type = 'purchase')
      |SELECT n_a, n_b, mean_a, mean_b,
      |  round((mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b), 4) AS t_stat
      |FROM s""".stripMargin

  /** k-anonymity audit over quasi-identifiers (nation ×
    * market segment): groups smaller than k are re-identification
    * risks the privacy review must see before a dataset ships — the
    * governance sibling of `text_redact_pii` (which handles direct
    * identifiers). One map-side-combinable aggregate to
    * QI-cardinality output. Pure integers.
    */
  def etlKAnonymity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).customer
      .groupBy($"c_nationkey", $"c_mktsegment")
      .agg(count(lit(1)).as("n"))
      .select($"c_nationkey", $"c_mktsegment", $"n", ($"n" < 10).as("at_risk"))
      .orderBy($"c_nationkey", $"c_mktsegment")
  }

  private val etlKAnonymitySql =
    """SELECT c_nationkey, c_mktsegment, count(*) AS n,
      |  count(*) < 10 AS at_risk
      |FROM customer GROUP BY 1, 2
      |ORDER BY c_nationkey, c_mktsegment""".stripMargin

  /** Activity survival curve: the fraction of signed-up users still
    * active ≥ h days after signup, h = 0, 7, …, 35 — the
    * Kaplan-Meier-style engagement read next to `q_retention_cohort`'s
    * grid. One per-user aggregate (signup day, last active day), a
    * bounded ×6 horizon fan-out (the q_rolling_dau explode rule), one
    * final aggregate. Survival divides two exact integers.
    */
  def qSurvivalCurve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val peru = Tables(spark, dir).events
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .groupBy($"user_id")
      .agg(min(when($"event_type" === "signup", $"day")).as("s_day"),
        max($"day").as("l_day"))
      .filter($"s_day".isNotNull)
    peru.select($"s_day", $"l_day",
        explode(sequence(lit(0L), lit(35L), lit(7L))).as("h"))
      .groupBy($"h")
      .agg(count(lit(1)).as("n_users"),
        sum(when($"l_day" - $"s_day" >= $"h", 1L).otherwise(0L)).as("n_active"))
      .select($"h".as("horizon_days"), $"n_users", $"n_active",
        round($"n_active" / $"n_users", 4).as("survival"))
      .orderBy($"horizon_days")
  }

  private val qSurvivalCurveSql =
    """WITH peru AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'signup'
      |      THEN epoch_us(ts) // 86400000000 END) AS s_day,
      |    max(epoch_us(ts) // 86400000000) AS l_day
      |  FROM events GROUP BY user_id),
      |f AS (
      |  SELECT s_day, l_day, unnest(range(0, 36, 7)) AS h
      |  FROM peru WHERE s_day IS NOT NULL)
      |SELECT h AS horizon_days, count(*) AS n_users,
      |  CAST(sum(CASE WHEN l_day - s_day >= h THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
      |  round(sum(CASE WHEN l_day - s_day >= h THEN 1 ELSE 0 END) / count(*), 4) AS survival
      |FROM f GROUP BY h ORDER BY horizon_days""".stripMargin

  /** Right-to-be-forgotten audit: purge a deletion-request key set
    * (here: customers with negative balance — a deterministic stand-in
    * for an uploaded request list) and emit the audit row a
    * compliance log needs: rows before, deleted, after, and the
    * ORDER-INDEPENDENT content digest of the surviving table
    * ([[graft.etl.TableDigest]] — so the regulator's replay can
    * verify the purge without moving the data). One anti-join + two
    * digest aggregates; the deletion list joins hint-free.
    */
  def etlRightToForget(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables(spark, dir).customer
    val requests = c.filter($"c_acctbal" < 0).select($"c_custkey")
    val kept = c.join(requests, Seq("c_custkey"), "left_anti")
    val digest = graft.etl.TableDigest.digest(kept, "customer_after", Seq(
      $"c_custkey", $"c_name", $"c_nationkey",
      round($"c_acctbal" * 100).cast("long"), $"c_mktsegment"))
    val counts = c.agg(count(lit(1)).as("n_before"))
      .crossJoin(requests.agg(count(lit(1)).as("n_deleted")))
    counts.crossJoin(digest)
      .select($"table_name", $"n_before", $"n_deleted",
        $"n_rows".as("n_after"), $"xor_digest")
  }

  private val etlRightToForgetSql =
    """WITH kept AS (
      |  SELECT * FROM customer WHERE c_custkey NOT IN
      |    (SELECT c_custkey FROM customer WHERE c_acctbal < 0)),
      |d AS (
      |  SELECT count(*) AS n_after,
      |    coalesce(CAST(bit_xor(CAST(('0x' || substr(md5(
      |      CAST(c_custkey AS VARCHAR) || '|' || c_name || '|' ||
      |      CAST(c_nationkey AS VARCHAR) || '|' ||
      |      CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS VARCHAR) || '|' ||
      |      c_mktsegment), 1, 15)) AS UBIGINT)) AS BIGINT), 0) AS xor_digest
      |  FROM kept)
      |SELECT 'customer_after' AS table_name,
      |  (SELECT count(*) FROM customer) AS n_before,
      |  (SELECT count(*) FROM customer WHERE c_acctbal < 0) AS n_deleted,
      |  n_after, xor_digest
      |FROM d""".stripMargin

  /** Temperature-scaled mixture weights (α = 0.7) — the multilingual
    * sampling recipe: raw language shares flatten to
    * share^α / Σ share^α, up-weighting tail languages without
    * discarding head data. Shares reduce map-side to lang-cardinality
    * counts; the re-normalization runs over that METADATA table. Both
    * engines compute pow on the identical share doubles (exact
    * integer divisions), so the rounded weights agree.
    */
  def corpusTemperatureMix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables(spark, dir).documents
      .groupBy($"lang").agg(count(lit(1)).as("n_docs"))
    val tot = per.agg(sum($"n_docs").as("total"))
    val powed = per.crossJoin(broadcast(tot))
      .withColumn("share", $"n_docs" / $"total")
      // quantize each weight to integer nanos BEFORE the normalizing
      // sum — a cross-group double sum is addition-order-dependent
      // (the q_ab_test pre-rounding recipe)
      .withColumn("wq", round(pow($"share", 0.7) * 1e9).cast("long"))
    val z = powed.agg(sum($"wq").as("z"))
    powed.crossJoin(broadcast(z))
      .select($"lang", $"n_docs", round($"share", 6).as("share"),
        round($"wq" / $"z", 6).as("t_share"))
      .orderBy($"lang")
  }

  private val corpusTemperatureMixSql =
    """WITH per AS (
      |  SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
      |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM per),
      |powed AS (
      |  SELECT lang, n_docs, n_docs / total AS share,
      |    CAST(round(pow(n_docs / total, 0.7) * 1e9) AS BIGINT) AS wq
      |  FROM per, tot),
      |z AS (SELECT CAST(sum(wq) AS BIGINT) AS z FROM powed)
      |SELECT lang, n_docs, round(share, 6) AS share,
      |  round(wq / z, 6) AS t_share
      |FROM powed, z ORDER BY lang""".stripMargin

  /** k-anonymity ENFORCEMENT — the fix to `etl_k_anonymity`'s audit:
    * quasi-identifier groups smaller than k get their market segment
    * generalized to 'ALL' (suppression to the parent of the
    * generalization hierarchy), then re-aggregated. The at-risk set
    * is a (nation × segment)-bounded broadcast; the rewrite is one
    * codegen'd conditional — the whole repair costs one extra scan.
    * Post-condition (specced): every surviving group has n ≥ k OR is
    * already fully generalized.
    */
  def etlKAnonymize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables(spark, dir).customer
    val risky = c.groupBy($"c_nationkey", $"c_mktsegment")
      .agg(count(lit(1)).as("n"))
      .filter($"n" < 10)
      .select($"c_nationkey".as("r_nat"), $"c_mktsegment".as("r_seg"))
    c.join(broadcast(risky),
        $"c_nationkey" === $"r_nat" && $"c_mktsegment" === $"r_seg", "left")
      .withColumn("segment_out",
        when($"r_nat".isNotNull, lit("ALL")).otherwise($"c_mktsegment"))
      .groupBy($"c_nationkey", $"segment_out")
      .agg(count(lit(1)).as("n"))
      .orderBy($"c_nationkey", $"segment_out")
  }

  private val etlKAnonymizeSql =
    """WITH risky AS (
      |  SELECT c_nationkey AS r_nat, c_mktsegment AS r_seg
      |  FROM customer GROUP BY 1, 2 HAVING count(*) < 10)
      |SELECT c_nationkey,
      |  CASE WHEN r_nat IS NOT NULL THEN 'ALL' ELSE c_mktsegment END AS segment_out,
      |  count(*) AS n
      |FROM customer LEFT JOIN risky
      |  ON c_nationkey = r_nat AND c_mktsegment = r_seg
      |GROUP BY 1, 2 ORDER BY c_nationkey, segment_out""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("etl_right_to_forget", etlRightToForget _, etlRightToForgetSql),
    QueryDef.sql("corpus_temperature_mix", corpusTemperatureMix _, corpusTemperatureMixSql),
    QueryDef.sql("q_forecast_linreg", qForecastLinreg _, qForecastLinregSql),
    QueryDef.sql("q_ab_test", qAbTest _, qAbTestSql),
    QueryDef.sql("etl_k_anonymity", etlKAnonymity _, etlKAnonymitySql),
    QueryDef.sql("etl_k_anonymize", etlKAnonymize _, etlKAnonymizeSql),
    QueryDef.sql("q_survival_curve", qSurvivalCurve _, qSurvivalCurveSql))


}
