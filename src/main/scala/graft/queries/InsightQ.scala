package graft.queries

import graft.Tables
import graft.functions.TextFns
import graft.operators.Sample
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 wave L — forecasting, spectral analysis, and governance:
  * a Yule–Walker AR(2) fit with a 7-step forecast (pure IEEE
  * arithmetic, so both engines produce bit-identical doubles), a
  * Fourier periodogram over the daily series, a leak-free
  * train/holdout split audit (md5 content addressing, zero source
  * overlap proven in-plan), an l-diversity privacy audit extending
  * the k-anonymity surface, and a Laspeyres price/volume/mix revenue
  * bridge. Autocovariances reduce in exact cross-multiplied longs;
  * trig terms quantize per-term before summing (the mutual-info
  * rule).
  */
object InsightQ {

  /** Daily purchase counts as one ordered array — the shared series
    * loader for the AR and periodogram gates (day-cardinality-bounded
    * state, the q_ship_latency rule).
    */
  private def purchaseSeries(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).events
      .filter($"event_type" === "purchase")
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("cnt"))
      .agg(expr("transform(array_sort(collect_list(struct(day, cnt))), x -> x.cnt)").as("av"))
      .withColumn("n", size($"av"))
      .withColumn("s", expr("aggregate(av, 0L, (a, x) -> a + x)"))
      .withColumn("mu", expr("CAST(s AS DOUBLE) / n"))
  }

  private val purchaseSeriesSql =
    """ser AS (
      |  SELECT list(cnt ORDER BY day) AS av FROM (
      |    SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS cnt
      |    FROM events WHERE event_type = 'purchase' GROUP BY 1)),
      |st AS (
      |  SELECT av, len(av) AS n, CAST(list_sum(av) AS BIGINT) AS s,
      |    CAST(CAST(list_sum(av) AS BIGINT) AS DOUBLE) / len(av) AS mu
      |  FROM ser)""".stripMargin

  // -------------------------------------------------------- ts_ar_forecast
  /** Yule–Walker AR(2) fit + 7-step-ahead forecast on the daily
    * purchase series. Autocovariances are computed in EXACT
    * cross-multiplied integers (Σ (n·xₜ−s)(n·xₜ₊ₖ−s) — no mean
    * subtraction in doubles), and everything after that is +,−,×,÷
    * on doubles: IEEE ops are correctly rounded, so with the
    * identical expression tree both engines produce bit-identical φ
    * and forecasts — no quantization needed, unlike the ln/cos gates.
    * The forecast recursion folds h=1..7 carrying only (yₜ₋₁, yₜ₋₂);
    * the oracle replays it as a 7-step recursive CTE. All state is
    * day-cardinality metadata.
    */
  def tsArForecast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def cov(k: Int): Column = expr(
      s"aggregate(sequence(1, n - $k), 0L, (a, i) -> a + (n * element_at(av, i) - s) * (n * element_at(av, i + $k) - s))")
    purchaseSeries(spark, dir)
      .withColumn("c0", cov(0)).withColumn("c1", cov(1)).withColumn("c2", cov(2))
      .withColumn("r1", expr("CAST(c1 AS DOUBLE) / c0"))
      .withColumn("r2", expr("CAST(c2 AS DOUBLE) / c0"))
      .withColumn("phi2", expr("(r2 - r1 * r1) / (1.0 - r1 * r1)"))
      .withColumn("phi1", expr("r1 * (1.0 - r2) / (1.0 - r1 * r1)"))
      .withColumn("fc", expr(
        """aggregate(sequence(1, 7),
          |  named_struct(
          |    'out', CAST(array() AS ARRAY<DOUBLE>),
          |    'p1', element_at(av, n) - mu,
          |    'p2', element_at(av, n - 1) - mu),
          |  (acc, h) -> named_struct(
          |    'out', concat(acc.out, array(phi1 * acc.p1 + phi2 * acc.p2)),
          |    'p1', phi1 * acc.p1 + phi2 * acc.p2,
          |    'p2', acc.p1),
          |  acc -> acc.out)""".stripMargin))
      .select($"mu", $"phi1", $"phi2", posexplode($"fc"))
      .select(($"pos" + 1).cast("long").as("h"),
        round($"phi1", 6).as("phi1"), round($"phi2", 6).as("phi2"),
        round($"mu" + $"col", 4).as("forecast"))
      .orderBy($"h")
  }

  private val tsArForecastSql =
    s"""WITH RECURSIVE $purchaseSeriesSql,
       |cv AS (
       |  SELECT av, n, s, mu,
       |    CAST(list_sum([(n * av[i] - s) * (n * av[i] - s) for i in range(1, n + 1)]) AS BIGINT) AS c0,
       |    CAST(list_sum([(n * av[i] - s) * (n * av[i + 1] - s) for i in range(1, n)]) AS BIGINT) AS c1,
       |    CAST(list_sum([(n * av[i] - s) * (n * av[i + 2] - s) for i in range(1, n - 1)]) AS BIGINT) AS c2
       |  FROM st),
       |ph AS (
       |  SELECT av, n, mu,
       |    CAST(c1 AS DOUBLE) / c0 AS r1, CAST(c2 AS DOUBLE) / c0 AS r2
       |  FROM cv),
       |ph2 AS (
       |  SELECT av, n, mu,
       |    (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi2,
       |    r1 * (1.0 - r2) / (1.0 - r1 * r1) AS phi1
       |  FROM ph),
       |fc AS (
       |  SELECT 0 AS h, av[n] - mu AS p1, av[n - 1] - mu AS p2,
       |    CAST(NULL AS DOUBLE) AS y
       |  FROM ph2
       |  UNION ALL
       |  SELECT h + 1, phi1 * p1 + phi2 * p2, p1, phi1 * p1 + phi2 * p2
       |  FROM fc, ph2 WHERE h < 7)
       |SELECT CAST(h AS BIGINT) AS h, round(phi1, 6) AS phi1,
       |  round(phi2, 6) AS phi2, round(mu + y, 4) AS forecast
       |FROM fc, ph2 WHERE h >= 1 ORDER BY h""".stripMargin

  // ------------------------------------------------------- ts_periodogram
  /** Discrete-Fourier periodogram of the centered daily purchase
    * series at frequencies k = 1..10: P(k) = C(k)² + S(k)² with the
    * cos/sin projections quantized to 1e-4 units BEFORE the sum
    * (integer addition is order-free; libm trig is the one
    * per-engine-deterministic piece, the ln precedent) — the
    * dominant-cycle detector behind seasonality-aware forecasting.
    * The series is day-cardinality metadata; the 10×n term grid is
    * constant work per frequency.
    */
  def tsPeriodogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    purchaseSeries(spark, dir)
      .select($"av", $"n", $"mu", explode(expr("sequence(1, 10)")).as("k"))
      .withColumn("cs", expr(
        "aggregate(sequence(1, n), 0L, (a, t) -> a + CAST(round((element_at(av, t) - mu) * cos(2.0 * pi() * k * t / n) * 10000) AS BIGINT))"))
      .withColumn("sn", expr(
        "aggregate(sequence(1, n), 0L, (a, t) -> a + CAST(round((element_at(av, t) - mu) * sin(2.0 * pi() * k * t / n) * 10000) AS BIGINT))"))
      .select($"k".cast("long").as("k"),
        round($"n".cast("double") / $"k", 2).as("period_days"),
        ($"cs" * $"cs" + $"sn" * $"sn").as("power_e8"))
      .withColumn("rank", row_number().over(
        Window.orderBy($"power_e8".desc, $"k")).cast("long"))
      .orderBy($"k")
  }

  private val tsPeriodogramSql =
    s"""WITH $purchaseSeriesSql,
       |ks AS (SELECT av, n, mu, unnest(range(1, 11)) AS k FROM st),
       |pw AS (
       |  SELECT k,
       |    round(CAST(n AS DOUBLE) / k, 2) AS period_days,
       |    CAST(list_sum([CAST(round((av[t] - mu) * cos(2.0 * pi() * k * t / n) * 10000) AS BIGINT) for t in range(1, n + 1)]) AS BIGINT) AS cs,
       |    CAST(list_sum([CAST(round((av[t] - mu) * sin(2.0 * pi() * k * t / n) * 10000) AS BIGINT) for t in range(1, n + 1)]) AS BIGINT) AS sn
       |  FROM ks)
       |SELECT CAST(k AS BIGINT) AS k, period_days,
       |  cs * cs + sn * sn AS power_e8,
       |  CAST(row_number() OVER (ORDER BY cs * cs + sn * sn DESC, k) AS BIGINT) AS rank
       |FROM pw ORDER BY k""".stripMargin

  // -------------------------------------------------- corpus_train_holdout
  /** Leak-free train/holdout split audit: documents split by the md5
    * of their SOURCE (never the doc id — domain-level splitting is
    * what prevents near-duplicate leakage across the boundary, the
    * reason LLM eval sets split by URL host). ~20% of sources land in
    * holdout; the gate emits per-split source/doc/token counts AND
    * the cross-split source overlap computed by an actual join —
    * proving in-plan, not by construction, that no source leaks.
    * Shape: one groupBy(source) metadata table drives everything;
    * the md5 keep-decision is the retry-stable content addressing
    * every sampling gate shares.
    */
  def corpusTrainHoldout(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables(spark, dir).documents
      .withColumn("split",
        when(Sample.md5Bucket($"source") < 200000, lit("holdout")).otherwise(lit("train")))
      .withColumn("n_toks", TextFns.tokenCount($"text"))
    val per = docs.groupBy($"split")
      .agg(countDistinct($"source").as("n_sources"),
        count(lit(1)).as("n_docs"), sum($"n_toks").as("n_tokens"))
    val srcs = docs.select($"split", $"source").distinct()
    val overlap = srcs.filter($"split" === "train").select($"source")
      .join(srcs.filter($"split" === "holdout").select($"source"), "source")
      .agg(count(lit(1)).as("overlap_sources"))
    per.crossJoin(overlap).orderBy($"split")
  }

  private val corpusTrainHoldoutSql =
    s"""WITH d AS (
      |  SELECT source, text,
      |    CASE WHEN CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT) % 1000000 < 200000
      |         THEN 'holdout' ELSE 'train' END AS split
      |  FROM documents),
      |per AS (
      |  SELECT split, count(DISTINCT source) AS n_sources, count(*) AS n_docs,
      |    CAST(sum(len(${QueryDef.toksSql()})) AS BIGINT) AS n_tokens
      |  FROM d GROUP BY split),
      |srcs AS (SELECT DISTINCT split, source FROM d),
      |ov AS (
      |  SELECT count(*) AS overlap_sources
      |  FROM (SELECT source FROM srcs WHERE split = 'train') t
      |  JOIN (SELECT source FROM srcs WHERE split = 'holdout') h USING (source))
      |SELECT split, n_sources, n_docs, n_tokens, overlap_sources
      |FROM per, ov ORDER BY split""".stripMargin

  // ------------------------------------------------------- etl_l_diversity
  /** l-diversity audit — the attack k-anonymity misses: a
    * quasi-identifier group can be large yet expose everyone if the
    * SENSITIVE attribute is uniform inside it. QI = (nation,
    * market segment); sensitive = the account-balance band
    * (floor(acctbal/2000)). Emits per-group size, distinct sensitive
    * values l, and the l<3 flag. One aggregate to a
    * QI-cardinality-bounded table — the same shape as the
    * k-anonymity gate it extends.
    */
  def etlLDiversity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).customer
      .withColumn("sens_band", expr("CAST(floor(c_acctbal / 2000) AS BIGINT)"))
      .groupBy($"c_nationkey", $"c_mktsegment")
      .agg(count(lit(1)).as("n"), countDistinct($"sens_band").as("l_diversity"))
      .withColumn("at_risk", $"l_diversity" < 3)
      .orderBy($"c_nationkey", $"c_mktsegment")
  }

  private val etlLDiversitySql =
    """SELECT c_nationkey, c_mktsegment, count(*) AS n,
      |  count(DISTINCT CAST(floor(c_acctbal / 2000) AS BIGINT)) AS l_diversity,
      |  count(DISTINCT CAST(floor(c_acctbal / 2000) AS BIGINT)) < 3 AS at_risk
      |FROM customer GROUP BY 1, 2 ORDER BY c_nationkey, c_mktsegment""".stripMargin

  // ------------------------------------------------------ q_revenue_bridge
  /** Laspeyres price/volume/mix revenue bridge between the last two
    * complete ship months: Δrevenue decomposed into price effect
    * Σ(p₁−p₀)q₀, volume effect Σp₀(q₁−q₀), the cross "mix" term
    * Σ(p₁−p₀)(q₁−q₀), and new/lost-part contributions — the FP&A
    * waterfall every revenue dashboard draws. Quantities are exact
    * longs; unit prices are rational (cents/qty) and each part's
    * effect quantizes to 1e-4 cents before the integer sum, so
    * partition order can't move the bridge. Shape: two month-slices
    * of one part-month aggregate full-outer-joined on partkey —
    * part-cardinality state, one shuffle.
    */
  def qRevenueBridge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val l = Tables(spark, dir).lineitem
      .withColumn("mi", year($"l_shipdate") * 12 + month($"l_shipdate"))
    val bounds = l.agg((max($"mi") - 1).as("m1")).withColumn("m0", $"m1" - 1)
    val pm = l.join(broadcast(bounds), $"mi" === $"m1" || $"mi" === $"m0")
      .groupBy($"l_partkey", $"mi", $"m0", $"m1")
      .agg(sum($"l_quantity".cast("long")).as("q"),
        sum(round($"l_extendedprice" * 100).cast("long")).as("cents"))
    val f0 = pm.filter($"mi" === $"m0")
      .select($"l_partkey", $"q".as("q0"), $"cents".as("c0"))
    val f1 = pm.filter($"mi" === $"m1")
      .select($"l_partkey", $"q".as("q1"), $"cents".as("c1"))
    f0.join(f1, Seq("l_partkey"), "full_outer")
      .crossJoin(broadcast(bounds))
      .agg(
        max($"m0").cast("long").as("month0"), max($"m1").cast("long").as("month1"),
        sum(coalesce($"c0", lit(0L))).as("rev0_cents"),
        sum(coalesce($"c1", lit(0L))).as("rev1_cents"),
        sum(when($"c0".isNotNull && $"c1".isNotNull,
          expr("CAST(round((CAST(c1 AS DOUBLE) / q1 - CAST(c0 AS DOUBLE) / q0) * q0 * 10000) AS BIGINT)"))
          .otherwise(0L)).as("price_eff_e4"),
        sum(when($"c0".isNotNull && $"c1".isNotNull,
          expr("CAST(round(CAST(c0 AS DOUBLE) / q0 * (q1 - q0) * 10000) AS BIGINT)"))
          .otherwise(0L)).as("volume_eff_e4"),
        sum(when($"c0".isNotNull && $"c1".isNotNull,
          expr("CAST(round((CAST(c1 AS DOUBLE) / q1 - CAST(c0 AS DOUBLE) / q0) * (q1 - q0) * 10000) AS BIGINT)"))
          .otherwise(0L)).as("mix_eff_e4"),
        sum(when($"c0".isNull, $"c1").otherwise(0L)).as("new_eff_cents"),
        sum(when($"c1".isNull, $"c0").otherwise(0L)).as("lost_eff_cents"),
        sum(when($"c0".isNotNull && $"c1".isNotNull, 1L).otherwise(0L)).as("n_common_parts"),
        sum(when($"c0".isNull, 1L).otherwise(0L)).as("n_new_parts"),
        sum(when($"c1".isNull, 1L).otherwise(0L)).as("n_lost_parts"))
      .withColumn("delta_cents", $"rev1_cents" - $"rev0_cents")
  }

  private val qRevenueBridgeSql =
    """WITH l AS (
      |  SELECT l_partkey, year(l_shipdate) * 12 + month(l_shipdate) AS mi,
      |    CAST(l_quantity AS BIGINT) AS q,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      |  FROM lineitem),
      |b AS (SELECT max(mi) - 1 AS m1, max(mi) - 2 AS m0 FROM l),
      |pm AS (
      |  SELECT l_partkey, mi, CAST(sum(q) AS BIGINT) AS q,
      |    CAST(sum(cents) AS BIGINT) AS cents
      |  FROM l, b WHERE mi = m1 OR mi = m0 GROUP BY 1, 2),
      |f0 AS (SELECT l_partkey, q AS q0, cents AS c0 FROM pm, b WHERE mi = m0),
      |f1 AS (SELECT l_partkey, q AS q1, cents AS c1 FROM pm, b WHERE mi = m1),
      |j AS (SELECT * FROM f0 FULL OUTER JOIN f1 USING (l_partkey))
      |SELECT
      |  CAST((SELECT m0 FROM b) AS BIGINT) AS month0,
      |  CAST((SELECT m1 FROM b) AS BIGINT) AS month1,
      |  CAST(sum(coalesce(c0, 0)) AS BIGINT) AS rev0_cents,
      |  CAST(sum(coalesce(c1, 0)) AS BIGINT) AS rev1_cents,
      |  CAST(sum(CASE WHEN c0 IS NOT NULL AND c1 IS NOT NULL THEN
      |    CAST(round((CAST(c1 AS DOUBLE) / q1 - CAST(c0 AS DOUBLE) / q0) * q0 * 10000) AS BIGINT)
      |    ELSE 0 END) AS BIGINT) AS price_eff_e4,
      |  CAST(sum(CASE WHEN c0 IS NOT NULL AND c1 IS NOT NULL THEN
      |    CAST(round(CAST(c0 AS DOUBLE) / q0 * (q1 - q0) * 10000) AS BIGINT)
      |    ELSE 0 END) AS BIGINT) AS volume_eff_e4,
      |  CAST(sum(CASE WHEN c0 IS NOT NULL AND c1 IS NOT NULL THEN
      |    CAST(round((CAST(c1 AS DOUBLE) / q1 - CAST(c0 AS DOUBLE) / q0) * (q1 - q0) * 10000) AS BIGINT)
      |    ELSE 0 END) AS BIGINT) AS mix_eff_e4,
      |  CAST(sum(CASE WHEN c0 IS NULL THEN c1 ELSE 0 END) AS BIGINT) AS new_eff_cents,
      |  CAST(sum(CASE WHEN c1 IS NULL THEN c0 ELSE 0 END) AS BIGINT) AS lost_eff_cents,
      |  CAST(sum(CASE WHEN c0 IS NOT NULL AND c1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_common_parts,
      |  CAST(sum(CASE WHEN c0 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new_parts,
      |  CAST(sum(CASE WHEN c1 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_lost_parts,
      |  CAST(sum(coalesce(c1, 0)) AS BIGINT) - CAST(sum(coalesce(c0, 0)) AS BIGINT) AS delta_cents
      |FROM j""".stripMargin

  // ---------------------------------------------------------------- registry

  // ------------------------------------------------- ts_spectral_entropy
  /** Spectral entropy of the purchase periodogram — how concentrated
    * the series' power is in one cycle (≈0: a single dominant
    * seasonality; ≈1: white noise). Composes the gated `ts_periodogram`
    * plan VERBATIM (the ann_recall_eval composition rule — the
    * entropy can never drift from the spectrum it summarizes); each
    * −p·ln p term nano-quantizes before the cross-frequency sum (the
    * corpus_token_entropy recipe), normalized by ln(#frequencies).
    */
  def tsSpectralEntropy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = tsPeriodogram(spark, dir).select($"k", $"power_e8")
    val tot = p.agg(sum($"power_e8").as("tot"), count(lit(1)).as("nf"))
    p.crossJoin(broadcast(tot))
      .withColumn("t_e9", expr(
        """CASE WHEN power_e8 = 0 THEN CAST(0 AS BIGINT)
          |ELSE CAST(round(-1e9 * (CAST(power_e8 AS DOUBLE) / tot) *
          |  ln(CAST(power_e8 AS DOUBLE) / tot)) AS BIGINT) END"""
          .stripMargin.replace("\n", " ")))
      .groupBy($"nf", $"tot")
      .agg(sum($"t_e9").as("h_e9"),
        max(expr("CAST(round(1e6 * CAST(power_e8 AS DOUBLE) / tot) AS BIGINT)")).as("dom_e6"))
      .select($"nf".as("n_freqs"),
        expr("round(h_e9 / 1e9, 6)").as("entropy"),
        expr("round(h_e9 / 1e9 / ln(CAST(nf AS DOUBLE)), 6)").as("entropy_norm"),
        expr("round(dom_e6 / 1e6, 4)").as("dominant_share"))
  }

  private val tsSpectralEntropySql =
    s"""WITH pg AS (SELECT k, power_e8 FROM ($tsPeriodogramSql)),
       |t AS (SELECT CAST(sum(power_e8) AS BIGINT) AS tot, count(*) AS nf FROM pg),
       |e AS (
       |  SELECT nf, tot,
       |    CASE WHEN power_e8 = 0 THEN CAST(0 AS BIGINT)
       |      ELSE CAST(round(-1e9 * (CAST(power_e8 AS DOUBLE) / tot) *
       |        ln(CAST(power_e8 AS DOUBLE) / tot)) AS BIGINT) END AS t_e9,
       |    CAST(round(1e6 * CAST(power_e8 AS DOUBLE) / tot) AS BIGINT) AS p_e6
       |  FROM pg, t)
       |SELECT nf AS n_freqs,
       |  round(CAST(sum(t_e9) AS BIGINT) / 1e9, 6) AS entropy,
       |  round(CAST(sum(t_e9) AS BIGINT) / 1e9 / ln(CAST(nf AS DOUBLE)), 6) AS entropy_norm,
       |  round(max(p_e6) / 1e6, 4) AS dominant_share
       |FROM e GROUP BY nf, tot""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("ts_spectral_entropy", tsSpectralEntropy _, tsSpectralEntropySql),
    QueryDef.sql("ts_ar_forecast", tsArForecast _, tsArForecastSql),
    QueryDef.sql("ts_periodogram", tsPeriodogram _, tsPeriodogramSql),
    QueryDef.sql("corpus_train_holdout", corpusTrainHoldout _, corpusTrainHoldoutSql),
    QueryDef.sql("etl_l_diversity", etlLDiversity _, etlLDiversitySql),
    QueryDef.sql("q_revenue_bridge", qRevenueBridge _, qRevenueBridgeSql))
}
