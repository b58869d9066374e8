package graft.queries

import graft.Tables
import graft.operators.Sample
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 wave — survival regression and causal inference: Cox
  * proportional hazards (Breslow ties, unrolled Newton), instrumental
  * variables (2SLS/Wald with a first-stage F), split conformal
  * prediction intervals, and Engle's ARCH LM volatility test. These
  * extend the engine past description (q_survival_curve's Kaplan–Meier
  * counts) into effect estimation — the analyses the reference's CSV
  * users run downstream of intake (streamlit_app.py's normalize→S3
  * mission feeds exactly this kind of modeling).
  *
  * Scale design: every gate reduces the fact table to either exact
  * integer sufficient statistics (IV, conformal OLS, ARCH) or a
  * calendar-bounded per-event-time table (Cox risk sets over distinct
  * duration days), then iterates on the tiny reduced table with
  * broadcast scalars — the Irls discipline (MlQ). Cross-engine
  * determinism: all data-sized sums are exact integers (BIGINT /
  * decimal(38,0)); every per-row double contribution is e6-quantized
  * to a BIGINT before summation, so group sums cannot drift with
  * partitioning; exp/ln carry the repo's accepted ≤1-ulp libm risk at
  * quantization boundaries (see EntityQ's q_fellegi_sunter note).
  */
object CausalQ {

  // ---------------------------------------------------------------- q_cox_ph
  /** Shared Cox Newton-step fragments — identical strings run as Spark
    * `expr` and interpolated into the DuckDB oracle, so the two
    * engines execute the same arithmetic. Columns: per-event-time
    * `d` (deaths), `d1` (deaths with x=1), `r1`/`r0` (at-risk counts
    * by covariate), scalar `b` (current beta). Binary covariate keeps
    * the risk-set sums S0/S1/S2 as COUNT arithmetic: S1 = S2 = r1·e^b,
    * S0 = r0 + r1·e^b.
    */
  private object Cox {
    val p = "((r1 * exp(b)) / (r0 + r1 * exp(b)))"
    // Breslow score and information contributions per distinct event
    // time, e6-quantized so the cross-time sum is exact
    val uTerm = s"CAST(round((d1 - d * $p) * 1e6) AS BIGINT)"
    val iTerm = s"CAST(round((d * $p * (1.0 - $p)) * 1e6) AS BIGINT)"
    val bNew = "b + (CAST(u AS DOUBLE) / CAST(i AS DOUBLE))"
    // Breslow partial log-likelihood contribution at one event time
    val llTerm = "CAST(round((b * d1 - d * ln(r0 + r1 * exp(b))) * 1e6) AS BIGINT)"
  }

  /** Cox proportional hazards regression — time from a customer's
    * first to last order, event = "churn observed" (last order ≥ 90
    * days before the lake's final order date; later = censored),
    * covariate x = BUILDING market segment. Breslow ties, 3 unrolled
    * Newton steps from β=0 (the q_logreg_irls discipline).
    *
    * Scale: one orders aggregate (customer-cardinality), one customer
    * join, then a group-by onto DISTINCT DURATION DAYS — the risk-set
    * cumulative counts run over a calendar-bounded table (≤ the lake's
    * day span, ~2.4k rows), never over subjects; each Newton step is
    * one exact-integer aggregate over that table with a broadcast β.
    */
  def qCoxPh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val per = t.orders
      .select($"o_custkey", expr("unix_micros(o_orderdate) div 86400000000").as("day"))
      .groupBy($"o_custkey")
      .agg(min($"day").as("fd"), max($"day").as("ld"))
    val mx = per.agg(max($"ld").as("maxd"))
    val subj = per
      .join(t.customer.select($"c_custkey",
        when($"c_mktsegment" === "BUILDING", 1L).otherwise(0L).as("x")),
        per("o_custkey") === $"c_custkey")
      .crossJoin(broadcast(mx))
      .select(($"ld" - $"fd").as("t"), $"x",
        when($"ld" <= $"maxd" - 90, 1L).otherwise(0L).as("ev"))
    val pt = subj.groupBy($"t")
      .agg(sum($"ev").as("d"), sum($"ev" * $"x").as("d1"),
        sum($"x").as("n1"), sum(lit(1L) - $"x").as("n0"))
    // risk set at t = everyone whose duration is >= t: cumulative
    // counts over duration days DESCENDING — a calendar-bounded
    // window (WindowLintSpec whitelists the domain)
    val wDesc = Window.orderBy($"t".desc).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val et = pt
      .withColumn("r1", sum($"n1").over(wDesc))
      .withColumn("r0", sum($"n0").over(wDesc))
      .filter($"d" >= 1)
      .select($"t", $"d", $"d1", $"r0", $"r1")
    var beta = spark.range(1).select(lit(0.0).as("b"))
    for (_ <- 1 to 3) {
      beta = et.crossJoin(broadcast(beta))
        .agg(sum(expr(Cox.uTerm)).as("u"), sum(expr(Cox.iTerm)).as("i"), min($"b").as("b"))
        .select(expr(Cox.bNew).as("b"))
    }
    val meta = subj.agg(count(lit(1)).as("n_subjects"), sum($"ev").as("n_events"))
    et.crossJoin(broadcast(beta))
      .agg(count(lit(1)).as("n_event_times"), min($"b").as("b"),
        sum(expr(Cox.llTerm)).as("ll_e6"))
      .crossJoin(broadcast(meta))
      .select($"n_subjects", $"n_events", $"n_event_times",
        expr("round(b, 6)").as("beta"),
        expr("round(exp(b), 6)").as("hazard_ratio"),
        expr("round(ll_e6 / 1e6, 4)").as("partial_ll"))
  }

  private val qCoxPhSql = {
    val step = (i: Int) =>
      s"""s$i AS (
         |  SELECT CAST(sum(${Cox.uTerm}) AS BIGINT) AS u,
         |    CAST(sum(${Cox.iTerm}) AS BIGINT) AS i, min(b) AS b
         |  FROM et, it${i - 1}),
         |it$i AS (SELECT ${Cox.bNew} AS b FROM s$i)""".stripMargin
    s"""WITH per AS (
       |  SELECT o_custkey,
       |    min(epoch_us(o_orderdate) // 86400000000) AS fd,
       |    max(epoch_us(o_orderdate) // 86400000000) AS ld
       |  FROM orders GROUP BY o_custkey),
       |mx AS (SELECT max(ld) AS maxd FROM per),
       |subj AS (
       |  SELECT p.ld - p.fd AS t,
       |    CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS x,
       |    CASE WHEN p.ld <= mx.maxd - 90 THEN 1 ELSE 0 END AS ev
       |  FROM per p JOIN customer c ON p.o_custkey = c.c_custkey, mx),
       |pt AS (
       |  SELECT t, CAST(sum(ev) AS BIGINT) AS d, CAST(sum(ev * x) AS BIGINT) AS d1,
       |    CAST(sum(x) AS BIGINT) AS n1, CAST(sum(1 - x) AS BIGINT) AS n0
       |  FROM subj GROUP BY t),
       |et AS (
       |  SELECT t, d, d1, r0, r1 FROM (
       |    SELECT t, d, d1,
       |      CAST(sum(n1) OVER (ORDER BY t DESC
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS r1,
       |      CAST(sum(n0) OVER (ORDER BY t DESC
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS r0
       |    FROM pt) WHERE d >= 1),
       |it0 AS (SELECT CAST(0.0 AS DOUBLE) AS b),
       |${step(1)},
       |${step(2)},
       |${step(3)},
       |meta AS (SELECT count(*) AS n_subjects, CAST(sum(ev) AS BIGINT) AS n_events FROM subj)
       |SELECT n_subjects, n_events, count(*) AS n_event_times,
       |  round(min(b), 6) AS beta, round(exp(min(b)), 6) AS hazard_ratio,
       |  round(CAST(sum(${Cox.llTerm}) AS BIGINT) / 1e6, 4) AS partial_ll
       |FROM et, it3, meta
       |GROUP BY n_subjects, n_events""".stripMargin
  }

  // -------------------------------------------------------------- q_iv_2sls
  /** Instrumental-variables estimate: outcome y = customer lifetime
    * spend (exact cents), regressor x = order count, instrument z =
    * nation-key parity (the suite's deterministic-assignment recipe —
    * q_ab_test's parity split). With one instrument + intercept, 2SLS
    * reduces to the Wald ratio cov(z,y)/cov(z,x); the gate reports it
    * next to naive OLS and the first-stage F (the weak-instrument
    * diagnostic every IV analysis must print).
    *
    * Scale: ONE customer-cardinality aggregate, then one row of exact
    * integer sufficient statistics (decimal(38,0) sums); every
    * estimate is a final-mile double expression on those exact sums —
    * identical in both engines by construction.
    */
  def qIv2sls(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val peru = t.orders
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("x"),
        sum(QueryDef.cents($"o_totalprice").cast("long")).as("y"))
      .join(t.customer.select($"c_custkey", ($"c_nationkey" % 2).as("z")),
        $"o_custkey" === $"c_custkey")
    val s = peru.agg(
      count(lit(1)).as("n"),
      sum($"z").as("sz"), sum($"x").as("sx"),
      sum($"y".cast("decimal(38,0)")).as("sy"),
      sum(($"z" * $"x").cast("decimal(38,0)")).as("szx"),
      sum(($"z" * $"y").cast("decimal(38,0)")).as("szy"),
      sum(($"x" * $"x").cast("decimal(38,0)")).as("sxx"),
      sum(($"x" * $"y").cast("decimal(38,0)")).as("sxy"),
      sum(($"z" * $"z").cast("decimal(38,0)")).as("szz"))
    s.select($"n".as("n_customers"),
      expr(Iv.betaOls).as("beta_ols_cents_per_order"),
      expr(Iv.betaIv).as("beta_iv_cents_per_order"),
      expr(Iv.fStat).as("first_stage_f"))
  }

  /** Final-mile IV expressions over the exact sufficient statistics —
    * shared verbatim between the Spark plan and the DuckDB oracle.
    */
  private object Iv {
    private val cd = (c: String) => s"CAST($c AS DOUBLE)"
    val covZy = s"(${cd("n")} * ${cd("szy")} - ${cd("sz")} * ${cd("sy")})"
    val covZx = s"(${cd("n")} * ${cd("szx")} - ${cd("sz")} * ${cd("sx")})"
    val covXy = s"(${cd("n")} * ${cd("sxy")} - ${cd("sx")} * ${cd("sy")})"
    val varX = s"(${cd("n")} * ${cd("sxx")} - ${cd("sx")} * ${cd("sx")})"
    val varZ = s"(${cd("n")} * ${cd("szz")} - ${cd("sz")} * ${cd("sz")})"
    val betaOls = s"round($covXy / $varX, 6)"
    val betaIv = s"round($covZy / $covZx, 6)"
    val rho2 = s"(($covZx * $covZx) / ($varZ * $varX))"
    val fStat = s"round((${cd("n")} - 2.0) * $rho2 / (1.0 - $rho2), 4)"
  }

  private val qIv2slsSql =
    s"""WITH peru AS (
       |  SELECT o.o_custkey, count(*) AS x,
       |    CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y,
       |    any_value(c.c_nationkey % 2) AS z
       |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       |  GROUP BY o.o_custkey),
       |s AS (
       |  SELECT count(*) AS n,
       |    CAST(sum(z) AS BIGINT) AS sz, CAST(sum(x) AS BIGINT) AS sx,
       |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
       |    CAST(sum(CAST(z * x AS HUGEINT)) AS HUGEINT) AS szx,
       |    CAST(sum(CAST(z AS HUGEINT) * y) AS HUGEINT) AS szy,
       |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
       |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
       |    CAST(sum(CAST(z * z AS HUGEINT)) AS HUGEINT) AS szz
       |  FROM peru)
       |SELECT n AS n_customers,
       |  ${Iv.betaOls} AS beta_ols_cents_per_order,
       |  ${Iv.betaIv} AS beta_iv_cents_per_order,
       |  ${Iv.fStat} AS first_stage_f
       |FROM s""".stripMargin

  // ---------------------------------------------- q_conformal_interval
  /** Split conformal prediction: fit order total ~ item count by OLS
    * on the train split, take the 0.9 conformal quantile of absolute
    * calibration residuals, report empirical coverage + width on the
    * held-out test split. Splits are the suite's deterministic md5
    * buckets (corpus_train_holdout's recipe): train 60% / calibration
    * 20% / test 20% by o_orderkey.
    *
    * Scale: the OLS fit and the coverage check are exact-integer
    * aggregates over the full splits; the calibration quantile runs
    * through the exact interpolated percentile on the CALIBRATION
    * split only — conformal calibration is a bounded sample by design
    * (the guarantee needs ~1k points; cap the split, not the scan).
    * Residuals are doubles built from exact ints with engine-identical
    * expressions, so the order statistic and the coverage comparison
    * agree bit-for-bit.
    */
  def qConformalInterval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val items = t.lineitem.groupBy($"l_orderkey").agg(count(lit(1)).as("x"))
    val base = t.orders
      .select($"o_orderkey", QueryDef.cents($"o_totalprice").cast("long").as("y"),
        Sample.md5Bucket($"o_orderkey").as("bkt"))
      .join(items, $"o_orderkey" === $"l_orderkey")
      .select($"y", $"x",
        when($"bkt" < 600000, "train").when($"bkt" < 800000, "cal")
          .otherwise("test").as("split"))
    val fit = base.filter($"split" === "train").agg(
      count(lit(1)).as("n"), sum($"x").as("sx"),
      sum($"y".cast("decimal(38,0)")).as("sy"),
      sum(($"x" * $"x").cast("decimal(38,0)")).as("sxx"),
      sum(($"x" * $"y").cast("decimal(38,0)")).as("sxy"))
      .select($"n".as("n_train"), expr(Conformal.slope).as("bb"),
        expr(Conformal.intercept).as("aa"))
    val scored = base.crossJoin(broadcast(fit))
      .withColumn("r", expr(Conformal.resid))
    val q = scored.filter($"split" === "cal")
      .agg(count(lit(1)).as("n_cal"), percentile($"r", lit(0.9)).as("q_hat"))
    scored.filter($"split" === "test")
      .crossJoin(broadcast(q))
      .agg(min($"n_train").as("n_train"), min($"n_cal").as("n_cal"),
        count(lit(1)).as("n_test"),
        sum(when($"r" <= $"q_hat", 1L).otherwise(0L)).as("n_covered"),
        min($"q_hat").as("q_hat"))
      .select($"n_train", $"n_cal", $"n_test",
        expr("round(q_hat, 6)").as("q_hat"),
        expr("round(CAST(n_covered AS DOUBLE) / n_test, 4)").as("coverage"),
        expr("round(2.0 * q_hat, 6)").as("interval_width"))
  }

  /** OLS + residual expressions over exact sums, shared verbatim. */
  private object Conformal {
    val slope = "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    val intercept = "(CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)"
    val resid = "abs(CAST(y AS DOUBLE) - (aa + bb * CAST(x AS DOUBLE)))"
  }

  private val qConformalIntervalSql =
    s"""WITH items AS (
       |  SELECT l_orderkey, count(*) AS x FROM lineitem GROUP BY l_orderkey),
       |base AS (
       |  SELECT CAST(round(o.o_totalprice * 100) AS BIGINT) AS y, i.x,
       |    CASE WHEN b < 600000 THEN 'train'
       |         WHEN b < 800000 THEN 'cal' ELSE 'test' END AS split
       |  FROM (SELECT o_orderkey, o_totalprice,
       |          CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT)
       |            % 1000000 AS b
       |        FROM orders) o
       |  JOIN items i ON o.o_orderkey = i.l_orderkey),
       |fit AS (
       |  SELECT n AS n_train, ${Conformal.slope} AS bb, ${Conformal.intercept} AS aa
       |  FROM (
       |    SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
       |      CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
       |      CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
       |      CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
       |    FROM base WHERE split = 'train')),
       |scored AS (
       |  SELECT split, ${Conformal.resid} AS r FROM base, fit),
       |q AS (
       |  SELECT count(*) AS n_cal, quantile_cont(r, 0.9) AS q_hat
       |  FROM scored WHERE split = 'cal')
       |SELECT min(f.n_train) AS n_train, min(q.n_cal) AS n_cal,
       |  count(*) AS n_test,
       |  round(min(q.q_hat), 6) AS q_hat,
       |  round(CAST(sum(CASE WHEN s.r <= q.q_hat THEN 1 ELSE 0 END) AS DOUBLE)
       |    / count(*), 4) AS coverage,
       |  round(2.0 * min(q.q_hat), 6) AS interval_width
       |FROM scored s, q, fit f WHERE s.split = 'test'""".stripMargin

  // ---------------------------------------------------------------- ts_arch_lm
  /** Engle's ARCH LM test on the daily revenue series: demean the
    * exact-cents series (residuals quantized back to exact integer
    * cents), regress e²_t on e²_{t−1} over consecutive-day pairs, and
    * report LM = (n−1)·R² against the χ²(1) 95% critical value — the
    * volatility-clustering diagnostic run before any GARCH fit.
    *
    * Scale: the series is a day-cardinality aggregate of exact cents;
    * the lag pairing is a self-join on day−1 (the ts_acf recipe — no
    * global window), and the regression reduces to exact decimal(38,0)
    * sums of integer products; R² is final-mile double arithmetic on
    * those exact sums.
    */
  def tsArchLm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables(spark, dir).events
      .filter($"event_type" === "purchase")
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(round($"value" * 100).cast("long")).as("cents"))
    val mean = daily.agg(count(lit(1)).as("nd"),
      sum($"cents".cast("decimal(38,0)")).as("sc"))
    // e = round(cents - mean): exact BIGINT residual (quantized once,
    // identically in both engines); e² is squared in WIDE integer
    // arithmetic (decimal(38,0) / HUGEINT) — a BIGINT square would
    // silently wrap in Spark (ANSI off) while DuckDB raised, the
    // moment |e| passed ~3.04e9 cents (ADVICE r10)
    val e = daily.crossJoin(broadcast(mean))
      .select($"day",
        expr("CAST(round(CAST(cents AS DOUBLE) - CAST(sc AS DOUBLE) / CAST(nd AS DOUBLE)) AS BIGINT)").as("e"))
      .select($"day", ($"e".cast("decimal(38,0)") * $"e".cast("decimal(38,0)")).as("e2"))
    val pairs = e.as("a")
      .join(e.as("b"), expr("b.day = a.day - 1"))
      .select(col("a.e2").as("v"), col("b.e2").as("u"))
    val s = pairs.agg(count(lit(1)).as("n"),
      sum($"u".cast("decimal(38,0)")).as("su"),
      sum($"v".cast("decimal(38,0)")).as("sv"),
      sum(($"u".cast("decimal(38,0)") * $"v").cast("decimal(38,0)")).as("suv"),
      sum(($"u".cast("decimal(38,0)") * $"u").cast("decimal(38,0)")).as("suu"),
      sum(($"v".cast("decimal(38,0)") * $"v").cast("decimal(38,0)")).as("svv"))
    s.select($"n".as("n_pairs"),
      expr(Arch.r2).as("r2"),
      expr(Arch.lm).as("lm_stat"),
      expr(s"CASE WHEN ${Arch.lmRaw} > 3.841459 THEN true ELSE false END").as("arch_present"))
  }

  /** R²/LM expressions over the exact regression sums, shared verbatim. */
  private object Arch {
    private val cd = (c: String) => s"CAST($c AS DOUBLE)"
    private val num = s"(${cd("n")} * ${cd("suv")} - ${cd("su")} * ${cd("sv")})"
    private val denU = s"(${cd("n")} * ${cd("suu")} - ${cd("su")} * ${cd("su")})"
    private val denV = s"(${cd("n")} * ${cd("svv")} - ${cd("sv")} * ${cd("sv")})"
    val r2Raw = s"(($num * $num) / ($denU * $denV))"
    val lmRaw = s"((${cd("n")} - 1.0) * $r2Raw)"
    val r2 = s"round($r2Raw, 6)"
    val lm = s"round($lmRaw, 4)"
  }

  private val tsArchLmSql =
    s"""WITH daily AS (
       |  SELECT epoch_us(ts) // 86400000000 AS day,
       |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
       |  FROM events WHERE event_type = 'purchase' GROUP BY day),
       |mean AS (
       |  SELECT count(*) AS nd, CAST(sum(CAST(cents AS HUGEINT)) AS HUGEINT) AS sc
       |  FROM daily),
       |e AS (
       |  SELECT day,
       |    CAST(round(CAST(cents AS DOUBLE) - CAST(sc AS DOUBLE) / CAST(nd AS DOUBLE)) AS BIGINT) AS e
       |  FROM daily, mean),
       |e2 AS (SELECT day, CAST(e AS HUGEINT) * e AS e2 FROM e),
       |pairs AS (
       |  SELECT a.e2 AS v, b.e2 AS u
       |  FROM e2 a JOIN e2 b ON b.day = a.day - 1),
       |s AS (
       |  SELECT count(*) AS n,
       |    CAST(sum(CAST(u AS HUGEINT)) AS HUGEINT) AS su,
       |    CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT) AS sv,
       |    CAST(sum(CAST(u AS HUGEINT) * v) AS HUGEINT) AS suv,
       |    CAST(sum(CAST(u AS HUGEINT) * u) AS HUGEINT) AS suu,
       |    CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS svv
       |  FROM pairs)
       |SELECT n AS n_pairs, ${Arch.r2} AS r2, ${Arch.lm} AS lm_stat,
       |  CASE WHEN ${Arch.lmRaw} > 3.841459 THEN true ELSE false END AS arch_present
       |FROM s""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef.sql("q_cox_ph", qCoxPh _, qCoxPhSql),
    QueryDef.sql("q_iv_2sls", qIv2sls _, qIv2slsSql),
    QueryDef.sql("q_conformal_interval", qConformalInterval _, qConformalIntervalSql),
    QueryDef.sql("ts_arch_lm", tsArchLm _, tsArchLmSql))
}
