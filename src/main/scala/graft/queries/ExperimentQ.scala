package graft.queries

import graft.Tables
import graft.operators.PrefixSum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 wave T — modern experimentation: CUPED variance reduction
  * (the pre-period-covariate adjustment every large A/B platform
  * runs) and an always-valid sequential test (mixture SPRT with a
  * normal mixture, monotone p-values via a running extreme).
  * Arms split on user parity — the suite's established deterministic
  * assignment (q_mann_whitney, q_ab_test).
  *
  * Scale design: CUPED is two aggregates — user-cardinality pre/post
  * sums, then one sufficient-statistics row; nothing but longs until
  * the final-mile θ/ρ² expressions. The mSPRT trajectory lives on the
  * day-cardinality series with cumulative counts from PrefixSum and
  * the monotone p-value from the bucket-offset running max — no
  * single-partition pass over events.
  */
object ExperimentQ {

  // ---------------------------------------------------------------- q_cuped
  /** CUPED: θ = cov(pre, post)/var(pre) over per-user purchase value
    * (first half of the window = pre-period covariate, second half =
    * experiment metric); variance reduction is exactly ρ², and the
    * treatment effect reports raw vs adjusted. Every moment reduces
    * as exact integer cents.
    */
  def qCuped(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, dir).events
      .select($"user_id", $"event_type",
        expr("unix_micros(ts) div 86400000000").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val mid = ev.agg(expr("(min(day) + max(day) + 1) div 2").as("mid"))
    val perUser = ev.crossJoin(broadcast(mid))
      .groupBy($"user_id")
      .agg(
        sum(when($"event_type" === "purchase" && $"day" < $"mid", $"cents")
          .otherwise(0L)).as("pre"),
        sum(when($"event_type" === "purchase" && $"day" >= $"mid", $"cents")
          .otherwise(0L)).as("post"))
      .withColumn("t", ($"user_id" % 2 === 1).cast("int"))
    val s = perUser.agg(
      count(lit(1)).as("n"),
      sum($"pre").as("sx"), sum($"post").as("sy"),
      sum($"pre" * $"pre").as("sxx"), sum($"post" * $"post").as("syy"),
      sum($"pre" * $"post").as("sxy"),
      sum($"t".cast("long")).as("n1"),
      sum($"pre" * $"t").as("sx1"), sum($"post" * $"t").as("sy1"))
    s.select($"n", $"n1",
      expr("round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)")
        .as("theta"),
      expr("""round(100 * pow(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy, 2) /
        |((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
        | (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 4)"""
        .stripMargin.replace("\n", " ")).as("var_reduction_pct"),
      expr("round((CAST(sy1 AS DOUBLE) / n1 - CAST(sy - sy1 AS DOUBLE) / (n - n1)) / 100, 4)")
        .as("effect_raw"),
      expr("""round((CAST(sy1 AS DOUBLE) / n1 - CAST(sy - sy1 AS DOUBLE) / (n - n1)
        |- ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
        |  * (CAST(sx1 AS DOUBLE) / n1 - CAST(sx - sx1 AS DOUBLE) / (n - n1))) / 100, 4)"""
        .stripMargin.replace("\n", " ")).as("effect_cuped"))
  }

  private val qCupedSql =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) // 86400000000 AS day,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |mid AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM ev),
      |pu AS (
      |  SELECT user_id,
      |    CAST(sum(CASE WHEN event_type = 'purchase' AND day < mid THEN cents ELSE 0 END) AS BIGINT) AS pre,
      |    CAST(sum(CASE WHEN event_type = 'purchase' AND day >= mid THEN cents ELSE 0 END) AS BIGINT) AS post,
      |    CAST(user_id % 2 = 1 AS INT) AS t
      |  FROM ev, mid GROUP BY user_id),
      |s AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(pre) AS BIGINT) AS sx, CAST(sum(post) AS BIGINT) AS sy,
      |    CAST(sum(pre * pre) AS BIGINT) AS sxx, CAST(sum(post * post) AS BIGINT) AS syy,
      |    CAST(sum(pre * post) AS BIGINT) AS sxy,
      |    CAST(sum(t) AS BIGINT) AS n1,
      |    CAST(sum(pre * t) AS BIGINT) AS sx1, CAST(sum(post * t) AS BIGINT) AS sy1
      |  FROM pu)
      |SELECT n, n1,
      |  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6) AS theta,
      |  round(100 * pow(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy, 2) / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *  (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 4) AS var_reduction_pct,
      |  round((CAST(sy1 AS DOUBLE) / n1 - CAST(sy - sy1 AS DOUBLE) / (n - n1)) / 100, 4) AS effect_raw,
      |  round((CAST(sy1 AS DOUBLE) / n1 - CAST(sy - sy1 AS DOUBLE) / (n - n1) - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))   * (CAST(sx1 AS DOUBLE) / n1 - CAST(sx - sx1 AS DOUBLE) / (n - n1))) / 100, 4) AS effect_cuped
      |FROM s""".stripMargin

  // ---------------------------------------------------------------- q_msprt
  /** Always-valid sequential test: per-day cumulative
    * conversion counts per arm (PrefixSum), normal-mixture SPRT
    * likelihood ratio Λₜ = √(V/(V+τ))·exp(δ̂²τ/(2V(V+τ))) with
    * mixture width τ = 1e-4, and the anytime p-value
    * pₜ = min_{s≤t} min(1, 1/Λₛ) enforced monotone through the
    * bucket-offset running max on e9-quantized values.
    */
  def qMsprt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables(spark, dir).events
      .filter($"event_type".isin("click", "purchase"))
      .select(expr("unix_micros(ts) div 86400000000").as("day"),
        ($"user_id" % 2 === 1).as("t"),
        ($"event_type" === "purchase").as("conv"))
      .groupBy($"day")
      .agg(sum(when(!$"t", 1L).otherwise(0L)).as("n0"),
        sum(when(!$"t" && $"conv", 1L).otherwise(0L)).as("x0"),
        sum(when($"t", 1L).otherwise(0L)).as("n1"),
        sum(when($"t" && $"conv", 1L).otherwise(0L)).as("x1"))
    val cum = PrefixSum.running(daily, $"day", expr("day div 8"),
      Seq(("n0", $"n0"), ("x0", $"x0"), ("n1", $"n1"), ("x1", $"x1")))
    val lam = cum.withColumn("vt", expr(
        """(CAST(cum_x0 + cum_x1 AS DOUBLE) / (cum_n0 + cum_n1)) *
          |(1.0 - CAST(cum_x0 + cum_x1 AS DOUBLE) / (cum_n0 + cum_n1)) *
          |(1.0 / cum_n0 + 1.0 / cum_n1)""".stripMargin.replace("\n", " ")))
      .withColumn("delta", expr(
        "CAST(cum_x1 AS DOUBLE) / cum_n1 - CAST(cum_x0 AS DOUBLE) / cum_n0"))
      .withColumn("lambda", expr(
        "sqrt(vt / (vt + 1e-4)) * exp(delta * delta * 1e-4 / (2 * vt * (vt + 1e-4)))"))
      // e9-quantized NEGATED p so the running max yields the running min
      .withColumn("negp_e9", expr(
        "CAST(round(-1e9 * least(1.0, 1.0 / lambda)) AS BIGINT)"))
    PrefixSum.runningMax(lam, $"day", expr("day div 8"), "negp", $"negp_e9")
      .select($"day", $"cum_n0", $"cum_n1",
        expr("round(delta, 6)").as("delta"),
        expr("round(lambda, 4)").as("lambda"),
        expr("round(-runmax_negp / 1e9, 6)").as("p_always_valid"))
      .orderBy($"day")
  }

  private val qMsprtSql =
    """WITH d AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day,
      |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
      |    CAST(sum(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS x0,
      |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(sum(CASE WHEN user_id % 2 = 1 AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS x1
      |  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1),
      |c AS (
      |  SELECT day,
      |    CAST(sum(n0) OVER w AS BIGINT) AS cum_n0, CAST(sum(x0) OVER w AS BIGINT) AS cum_x0,
      |    CAST(sum(n1) OVER w AS BIGINT) AS cum_n1, CAST(sum(x1) OVER w AS BIGINT) AS cum_x1
      |  FROM d WINDOW w AS (ORDER BY day)),
      |l AS (
      |  SELECT day, cum_n0, cum_n1,
      |    CAST(cum_x1 AS DOUBLE) / cum_n1 - CAST(cum_x0 AS DOUBLE) / cum_n0 AS delta,
      |    (CAST(cum_x0 + cum_x1 AS DOUBLE) / (cum_n0 + cum_n1)) * (1.0 - CAST(cum_x0 + cum_x1 AS DOUBLE) / (cum_n0 + cum_n1)) * (1.0 / cum_n0 + 1.0 / cum_n1) AS vt
      |  FROM c),
      |m AS (
      |  SELECT day, cum_n0, cum_n1, delta,
      |    sqrt(vt / (vt + 1e-4)) * exp(delta * delta * 1e-4 / (2 * vt * (vt + 1e-4))) AS lambda
      |  FROM l),
      |p AS (
      |  SELECT day, cum_n0, cum_n1, delta, lambda,
      |    CAST(round(-1e9 * least(1.0, 1.0 / lambda)) AS BIGINT) AS negp_e9
      |  FROM m)
      |SELECT day, cum_n0, cum_n1, round(delta, 6) AS delta,
      |  round(lambda, 4) AS lambda,
      |  round(-max(negp_e9) OVER (ORDER BY day) / 1e9, 6) AS p_always_valid
      |FROM p ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- registry

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("q_cuped", qCuped _, qCupedSql),
    QueryDef.sql("q_msprt", qMsprt _, qMsprtSql))
}
