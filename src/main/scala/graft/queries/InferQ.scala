package graft.queries

import graft.Tables
import graft.operators.PrefixSum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 wave — inferential + concentration statistics, and the
  * bucketed-join layout demo. The statistical gates all follow the
  * exact-sufficient-statistics discipline: quantize inputs to
  * integers ONCE (cents / 1e-4 dollars), reduce with map-side-
  * combinable integer sums (100 TB → a handful of longs), and only
  * then run the final-mile double arithmetic — written as the
  * IDENTICAL expression in both engines, so the results agree
  * bit-for-bit (the q_ab_test / q_ks_test recipe).
  */
object InferQ {

  /** Per-row lineitem revenue in exact 1e-4 dollars: cents × (100 −
    * discount basis points), both integer.
    */
  private def revE4 = round(col("l_extendedprice") * 100).cast("long") *
    (lit(100L) - round(col("l_discount") * 100).cast("long"))

  private val revE4Sql =
    "CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))"

  // ---------------------------------------------------------------- q_hhi

  /** Herfindahl–Hirschman concentration of supplier revenue within
    * each nation — the market-structure audit next to `q_gini`. Per-
    * supplier revenue reduces to exact 1e-4-dollar longs; shares are
    * divisions of identical longs (IEEE-deterministic); each share²
    * quantizes to 1e-12 units BEFORE the cross-supplier sum (a cross-
    * group double sum is addition-order-dependent — the
    * corpus_temperature_mix rule). Output stays integer-only: hhi_e12
    * is the index in 1e-12 units (10 000 × HHI-points × 1e8), so the
    * gate has NO final-mile rounding at all.
    */
  def qHhi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val perSupp = t.lineitem
      .groupBy($"l_suppkey").agg(sum(revE4).as("rev_e4"))
      .join(t.supplier.select($"s_suppkey", $"s_nationkey"),
        $"l_suppkey" === $"s_suppkey")
    // Nation totals come from a nation-PARTITIONED window over the
    // supplier-cardinality aggregate — parallel across nations, and
    // lineitem is scanned exactly once (a self-join for the totals
    // would print, and pre-AQE execute, a second scan).
    val w = Window.partitionBy($"s_nationkey")
    perSupp
      .withColumn("n_suppliers", count(lit(1)).over(w))
      .withColumn("total_e4", sum($"rev_e4").over(w))
      .withColumn("wq",
        round(($"rev_e4" / $"total_e4") * ($"rev_e4" / $"total_e4") * 1e12).cast("long"))
      .groupBy($"s_nationkey")
      .agg(max($"n_suppliers").as("n_suppliers"), max($"total_e4").as("total_e4"),
        sum($"wq").as("hhi_e12"))
      .orderBy($"s_nationkey")
  }

  private val qHhiSql =
    s"""WITH per_supp AS (
       |  SELECT l_suppkey, CAST(sum($revE4Sql) AS BIGINT) AS rev_e4
       |  FROM lineitem GROUP BY 1),
       |j AS (
       |  SELECT s_nationkey, rev_e4,
       |    count(*) OVER (PARTITION BY s_nationkey) AS n_suppliers,
       |    CAST(sum(rev_e4) OVER (PARTITION BY s_nationkey) AS BIGINT) AS total_e4
       |  FROM per_supp JOIN supplier ON l_suppkey = s_suppkey)
       |SELECT s_nationkey, max(n_suppliers) AS n_suppliers, max(total_e4) AS total_e4,
       |  CAST(sum(CAST(round((rev_e4 / total_e4) * (rev_e4 / total_e4) * 1e12) AS BIGINT)) AS BIGINT) AS hhi_e12
       |FROM j GROUP BY 1 ORDER BY s_nationkey""".stripMargin

  // ---------------------------------------------------------- q_theil_index

  /** Theil T inequality of customer spend within each market segment
    * — the decomposable complement to `q_gini` (Theil is additive
    * across subgroups; Gini is not, which is why an inequality
    * dashboard wants both). Per-customer spend is exact cents; the
    * ratio r = x·n/T is built from identical longs in both engines;
    * each r·ln(r) term nano-quantizes before the cross-customer sum
    * (the corpus_token_entropy ln recipe). At 100 TB the per-segment
    * term sum is one map-side-combinable long aggregate.
    */
  def qTheilIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val perCust = t.orders
      .join(t.customer.select($"c_custkey", $"c_mktsegment"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment", $"o_custkey")
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
    val segStats = perCust.groupBy($"c_mktsegment".as("s_seg"))
      .agg(count(lit(1)).as("n"), sum($"cents").as("t"))
    perCust.join(broadcast(segStats), $"c_mktsegment" === $"s_seg")
      .withColumn("r", $"cents".cast("double") * $"n" / $"t")
      .withColumn("tq", round($"r" * log($"r") * 1e9).cast("long"))
      .groupBy($"c_mktsegment")
      .agg(max($"n").as("n_customers"), sum($"tq").as("sum_term_e9"))
      .select($"c_mktsegment", $"n_customers", $"sum_term_e9",
        round($"sum_term_e9".cast("double") / ($"n_customers" * 1e9), 6).as("theil"))
      .orderBy($"c_mktsegment")
  }

  private val qTheilIndexSql =
    """WITH pc AS (
      |  SELECT c_mktsegment, o_custkey,
      |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |s AS (SELECT c_mktsegment AS s_seg, count(*) AS n, CAST(sum(cents) AS BIGINT) AS t
      |  FROM pc GROUP BY 1),
      |terms AS (
      |  SELECT c_mktsegment, n,
      |    CAST(round((CAST(cents AS DOUBLE) * n / t) * ln(CAST(cents AS DOUBLE) * n / t) * 1e9) AS BIGINT) AS tq
      |  FROM pc JOIN s ON c_mktsegment = s_seg)
      |SELECT c_mktsegment, max(n) AS n_customers, CAST(sum(tq) AS BIGINT) AS sum_term_e9,
      |  round(CAST(sum(tq) AS DOUBLE) / (max(n) * 1e9), 6) AS theil
      |FROM terms GROUP BY 1 ORDER BY c_mktsegment""".stripMargin

  // -------------------------------------------------------- q_spearman_corr

  /** Spearman rank correlation (average-tie ranks) between account
    * balance and realized spend, per nation — the monotone-
    * association read Pearson (`q_corr_stats`) misses. The tie-safe
    * trick: 2·avgRank = 2·rank() + tieCount − 1 is always an INTEGER,
    * so ranks and all five co-moment sums stay exact longs and ρ is
    * one deterministic double expression at the end (Spearman is
    * scale-invariant, so ρ on 2× ranks equals ρ on ranks). Ranks are
    * windowed PER NATION — partition-parallel, never a global sort.
    */
  def qSpearmanCorr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val spend = t.orders.groupBy($"o_custkey")
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("ycents"))
    val base = t.customer
      .select($"c_custkey", $"c_nationkey", round($"c_acctbal" * 100).cast("long").as("x"))
      .join(spend, $"c_custkey" === $"o_custkey", "left")
      .select($"c_nationkey", $"x", coalesce($"ycents", lit(0L)).as("y"))
    val xr = lit(2L) * rank().over(Window.partitionBy($"c_nationkey").orderBy($"x")) +
      count(lit(1)).over(Window.partitionBy($"c_nationkey", $"x")) - 1
    val yr = lit(2L) * rank().over(Window.partitionBy($"c_nationkey").orderBy($"y")) +
      count(lit(1)).over(Window.partitionBy($"c_nationkey", $"y")) - 1
    val s = base.select($"c_nationkey", xr.as("xr"), yr.as("yr"))
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n"), sum($"xr").as("sx"), sum($"yr").as("sy"),
        sum($"xr" * $"yr").as("sxy"), sum($"xr" * $"xr").as("sxx"),
        sum($"yr" * $"yr").as("syy"))
    s.select($"c_nationkey", $"n".as("n_customers"),
        when(($"n" * $"sxx" - $"sx" * $"sx" > 0) && ($"n" * $"syy" - $"sy" * $"sy" > 0),
          round(($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
            sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast("double") *
              ($"n" * $"syy" - $"sy" * $"sy").cast("double")), 6))
          .as("spearman"))
      .orderBy($"c_nationkey")
  }

  private val qSpearmanCorrSql =
    """WITH spend AS (
      |  SELECT o_custkey, CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS ycents
      |  FROM orders GROUP BY 1),
      |b AS (
      |  SELECT c_nationkey, CAST(round(c_acctbal*100) AS BIGINT) AS x,
      |    coalesce(ycents, 0) AS y
      |  FROM customer LEFT JOIN spend ON c_custkey = o_custkey),
      |r AS (
      |  SELECT c_nationkey,
      |    2*rank() OVER (PARTITION BY c_nationkey ORDER BY x)
      |      + count(*) OVER (PARTITION BY c_nationkey, x) - 1 AS xr,
      |    2*rank() OVER (PARTITION BY c_nationkey ORDER BY y)
      |      + count(*) OVER (PARTITION BY c_nationkey, y) - 1 AS yr
      |  FROM b),
      |s AS (
      |  SELECT c_nationkey, count(*) AS n, CAST(sum(xr) AS BIGINT) AS sx,
      |    CAST(sum(yr) AS BIGINT) AS sy, CAST(sum(xr*yr) AS BIGINT) AS sxy,
      |    CAST(sum(xr*xr) AS BIGINT) AS sxx, CAST(sum(yr*yr) AS BIGINT) AS syy
      |  FROM r GROUP BY 1)
      |SELECT c_nationkey, n AS n_customers,
      |  CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0 THEN
      |    round(CAST(n*sxy - sx*sy AS DOUBLE) /
      |      sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)), 6)
      |  END AS spearman
      |FROM s ORDER BY c_nationkey""".stripMargin

  // -------------------------------------------------------- q_mann_whitney

  /** Mann-Whitney U between the two experiment cohorts (even vs odd
    * user id) on purchase value — the nonparametric sibling of
    * `q_ab_test` (no normality assumption; what an experimentation
    * platform reports when values are heavy-tailed). The global
    * ranking never materializes per-row: purchases reduce map-side to
    * per-distinct-cent counts, the cumulative count runs through the
    * PrefixSum bucket-offset two-pass over that value-cardinality
    * table, and 2·R_a (tie-averaged, ×2 to stay integer) folds in one
    * exact long sum. u2_a = 2·U_a is emitted exactly; only the
    * tie-corrected z is final-mile double arithmetic.
    */
  def qMannWhitney(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables(spark, dir).events
      .filter($"event_type" === "purchase")
      .select(round($"value" * 100).cast("long").as("v"),
        ($"user_id" % 2 === 0).as("a"))
      .groupBy($"v")
      .agg(sum(when($"a", 1L).otherwise(0L)).as("na"), count(lit(1)).as("n"))
    val cum = PrefixSum.running(per, $"v", expr("v div 10000"), Seq(("n", $"n")))
    val s = cum.agg(
      sum($"na").as("n_a"), sum($"n" - $"na").as("n_b"),
      sum($"na" * (lit(2L) * ($"cum_n" - $"n") + $"n" + 1)).as("r2_a"),
      sum($"n" * $"n" * $"n" - $"n").as("t3"))
    s.select($"n_a", $"n_b",
        ($"r2_a" - $"n_a" * ($"n_a" + 1)).as("u2_a"),
        round((($"r2_a" - $"n_a" * ($"n_a" + 1)) / 2.0 -
            $"n_a".cast("double") * $"n_b" / 2.0) /
          sqrt(($"n_a".cast("double") * $"n_b" / 12.0) *
            (($"n_a" + $"n_b" + 1) - $"t3".cast("double") /
              (($"n_a" + $"n_b").cast("double") * ($"n_a" + $"n_b" - 1)))), 4)
          .as("z_stat"))
  }

  private val qMannWhitneySql =
    """WITH p AS (
      |  SELECT CAST(round(value*100) AS BIGINT) AS v, user_id % 2 = 0 AS a
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT v, CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |    count(*) AS n
      |  FROM p GROUP BY v),
      |w AS (SELECT v, na, n, CAST(sum(n) OVER (ORDER BY v) AS BIGINT) AS cum_n FROM c),
      |s AS (
      |  SELECT CAST(sum(na) AS BIGINT) AS n_a, CAST(sum(n - na) AS BIGINT) AS n_b,
      |    CAST(sum(na * (2*(cum_n - n) + n + 1)) AS BIGINT) AS r2_a,
      |    CAST(sum(n*n*n - n) AS BIGINT) AS t3
      |  FROM w)
      |SELECT n_a, n_b, r2_a - n_a*(n_a + 1) AS u2_a,
      |  round(((r2_a - n_a*(n_a + 1)) / 2.0 - CAST(n_a AS DOUBLE) * n_b / 2.0) /
      |    sqrt((CAST(n_a AS DOUBLE) * n_b / 12.0) *
      |      ((n_a + n_b + 1) - CAST(t3 AS DOUBLE) /
      |        (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1)))), 4) AS z_stat
      |FROM s""".stripMargin

  // ------------------------------------------------------------ q_anova_f

  /** One-way ANOVA F across event types on event value — the k-group
    * generalization of `q_ab_test`'s two-cohort t. Per-group
    * count/mean/variance reduce map-side (100 TB → 3k numbers), each
    * PRE-ROUNDED to 4 decimals so the moment inputs are identical in
    * both engines; the rounded moments then re-quantize to exact
    * integer 1e-4 units so the CROSS-GROUP sums (grand mean, SSW,
    * SSB) are order-independent longs, and F is one deterministic
    * division at the end.
    */
  def qAnovaF(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // The totals come from an unpartitioned window over the k-row
    // grouped-moments table (metadata — the binpack rule), so events
    // is scanned exactly once.
    val wAll = Window.partitionBy()
    val ssb = Tables(spark, dir).events
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        round(avg($"value"), 4).as("mean4"),
        round(var_samp($"value"), 4).as("var4"))
      .withColumn("m4", round($"mean4" * 1e4).cast("long"))
      .withColumn("v4", round($"var4" * 1e4).cast("long"))
      .withColumn("n_total", sum($"n").over(wAll))
      .withColumn("k", count(lit(1)).over(wAll))
      .withColumn("nm4", sum($"n" * $"m4").over(wAll))
      .withColumn("ssw_e4", sum(($"n" - 1) * $"v4").over(wAll))
      .withColumn("grand", $"nm4".cast("double") / ($"n_total" * 1e4))
      .withColumn("bq",
        round($"n" * ($"mean4" - $"grand") * ($"mean4" - $"grand") * 1e4).cast("long"))
      .agg(max($"n_total").as("n_total"), max($"k").as("k_groups"),
        max($"ssw_e4").as("ssw_e4"), sum($"bq").as("ssb_e4"))
    ssb.select($"k_groups", $"n_total", $"ssb_e4", $"ssw_e4",
      round(($"ssb_e4".cast("double") / ($"k_groups" - 1)) /
        ($"ssw_e4".cast("double") / ($"n_total" - $"k_groups")), 4).as("f_stat"))
  }

  private val qAnovaFSql =
    """WITH g AS (
      |  SELECT event_type, count(*) AS n,
      |    round(avg(value), 4) AS mean4, round(var_samp(value), 4) AS var4
      |  FROM events GROUP BY 1),
      |q AS (
      |  SELECT n, mean4, CAST(round(mean4 * 1e4) AS BIGINT) AS m4,
      |    CAST(round(var4 * 1e4) AS BIGINT) AS v4
      |  FROM g),
      |w AS (
      |  SELECT n, mean4,
      |    CAST(sum(n) OVER () AS BIGINT) AS n_total,
      |    count(*) OVER () AS k,
      |    CAST(sum(n * m4) OVER () AS BIGINT) AS nm4,
      |    CAST(sum((n - 1) * v4) OVER () AS BIGINT) AS ssw_e4
      |  FROM q),
      |b AS (
      |  SELECT n_total, k, ssw_e4,
      |    CAST(round(n * (mean4 - CAST(nm4 AS DOUBLE) / (n_total * 1e4))
      |      * (mean4 - CAST(nm4 AS DOUBLE) / (n_total * 1e4)) * 1e4) AS BIGINT) AS bq
      |  FROM w)
      |SELECT max(k) AS k_groups, max(n_total) AS n_total,
      |  CAST(sum(bq) AS BIGINT) AS ssb_e4, max(ssw_e4) AS ssw_e4,
      |  round((CAST(sum(bq) AS DOUBLE) / (max(k) - 1)) /
      |    (CAST(max(ssw_e4) AS DOUBLE) / (max(n_total) - max(k))), 4) AS f_stat
      |FROM b""".stripMargin

  // ---------------------------------------------------------- q_runs_test

  /** Wald-Wolfowitz runs test on the daily-revenue series: is the
    * above/below-mean sign sequence random, or does it trend/cluster
    * (the cheap pre-check before `ts_changepoint`)? The sign compares
    * CROSS-MULTIPLIED integers (rev·n vs total — no division, the
    * q_ks_test rule); the run count is one lag over the
    * days-cardinality daily aggregate (metadata, never the events);
    * expectation and z are deterministic doubles from exact ints.
    */
  def qRunsTest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Totals via an unpartitioned window over the days-cardinality
    // daily aggregate (metadata — the changepoint-scan rule): one
    // events scan, no self-join.
    val wAll = Window.partitionBy()
    val signed = Tables(spark, dir).events
      .filter($"event_type" === "purchase")
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(round($"value" * 1e4).cast("long")).as("rev_e4"))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("t", sum($"rev_e4").over(wAll))
      .withColumn("pos", $"rev_e4" * $"n" >= $"t")
    val lagPos = lag($"pos", 1).over(Window.orderBy($"day"))
    val s = signed
      .select($"n", $"pos", (lagPos.isNotNull && lagPos =!= $"pos").cast("long").as("flip"))
      .groupBy($"n")
      .agg(sum(when($"pos", 1L).otherwise(0L)).as("n_plus"),
        sum(when(!$"pos", 1L).otherwise(0L)).as("n_minus"),
        (sum($"flip") + 1).as("n_runs"))
    val twoPM = lit(2.0) * $"n_plus" * $"n_minus"
    s.select($"n".as("n_days"), $"n_plus", $"n_minus", $"n_runs",
        round(lit(1.0) + twoPM / $"n", 4).as("exp_runs"),
        round(($"n_runs" - (lit(1.0) + twoPM / $"n")) /
          sqrt((twoPM * (twoPM - $"n")) /
            ($"n".cast("double") * $"n" * ($"n" - 1))), 4).as("z_stat"))
  }

  private val qRunsTestSql =
    """WITH daily AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day,
      |    CAST(sum(CAST(round(value*1e4) AS BIGINT)) AS BIGINT) AS rev_e4
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |signed AS (
      |  SELECT day, count(*) OVER () AS n,
      |    rev_e4 * CAST(count(*) OVER () AS BIGINT)
      |      >= CAST(sum(rev_e4) OVER () AS BIGINT) AS pos
      |  FROM daily),
      |f AS (
      |  SELECT n, pos,
      |    CASE WHEN lag(pos) OVER (ORDER BY day) IS NOT NULL
      |      AND lag(pos) OVER (ORDER BY day) <> pos THEN 1 ELSE 0 END AS flip
      |  FROM signed),
      |s AS (
      |  SELECT n, CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_plus,
      |    CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS n_minus,
      |    CAST(sum(flip) + 1 AS BIGINT) AS n_runs
      |  FROM f GROUP BY n)
      |SELECT n AS n_days, n_plus, n_minus, n_runs,
      |  round(1.0 + 2.0 * n_plus * n_minus / n, 4) AS exp_runs,
      |  round((n_runs - (1.0 + 2.0 * n_plus * n_minus / n)) /
      |    sqrt((2.0 * n_plus * n_minus * (2.0 * n_plus * n_minus - n)) /
      |      (CAST(n AS DOUBLE) * n * (n - 1))), 4) AS z_stat
      |FROM s""".stripMargin

  // ------------------------------------------------------------- ts_cusum

  /** CUSUM drift curve over daily purchase revenue: the running sum
    * of deviations from the series mean — where |CUSUM| peaks is the
    * classic change-point estimate, and the full curve is what a
    * drift monitor plots. Deviations cross-multiply to stay integer
    * (rev·n − total, in 1e-4·n units), and the running sum goes
    * through the PrefixSum bucket-offset two-pass (bucketed by
    * 32-day epoch), not a single-partition window. Integer-only
    * output — bit-exact.
    */
  def tsCusum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wAll = Window.partitionBy()
    val dev = Tables(spark, dir).events
      .filter($"event_type" === "purchase")
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(round($"value" * 1e4).cast("long")).as("rev_e4"))
      .withColumn("dev",
        $"rev_e4" * count(lit(1)).over(wAll) - sum($"rev_e4").over(wAll))
    PrefixSum.running(dev, $"day", expr("day div 32"), Seq(("dev", $"dev")))
      .select($"day", $"rev_e4", $"dev", $"cum_dev")
      .orderBy($"day")
  }

  private val tsCusumSql =
    """WITH daily AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day,
      |    CAST(sum(CAST(round(value*1e4) AS BIGINT)) AS BIGINT) AS rev_e4
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |dev AS (
      |  SELECT day, rev_e4,
      |    rev_e4 * CAST(count(*) OVER () AS BIGINT)
      |      - CAST(sum(rev_e4) OVER () AS BIGINT) AS dev
      |  FROM daily)
      |SELECT day, rev_e4, dev,
      |  CAST(sum(dev) OVER (ORDER BY day) AS BIGINT) AS cum_dev
      |FROM dev ORDER BY day""".stripMargin

  // ----------------------------------------------------- etl_bucketed_join

  /** Bucketed-layout join — the shuffle-free co-located join every
    * 100 TB fact-to-fact plan wants: both sides are WRITTEN
    * pre-hashed into the same number of buckets on the join key, so
    * the join reads bucket i against bucket i with NO exchange on
    * either side (InferSpec pins the no-Exchange plan with broadcast
    * disabled). At cluster scale the bucket count is the write-time
    * knob that amortizes one shuffle across every future join on that
    * key. The gate proves the layout changes nothing semantically:
    * revenue per priority matches the plain-join oracle exactly
    * (integer 1e-4 revenue units).
    */
  /** App-scoped identifier for the bucketed-layout tables: two
    * concurrent runs over the same data dir get disjoint names (no
    * DROP race). Exposed so specs can address the tables this
    * session wrote.
    */
  private[graft] def bucketedTag(spark: SparkSession, dir: String): String =
    spark.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_") +
      "_" + dir.replaceAll("[^A-Za-z0-9]", "_")

  def etlBucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the whole per-app tree is best-effort deleted at JVM exit so
    // gate runs leave no artifacts behind
    val app = spark.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")
    val tag = bucketedTag(spark, dir)
    val base = s"/tmp/graft_bucketed/$app/$tag"
    BucketedJoinCleanup.register(s"/tmp/graft_bucketed/$app")
    val t = Tables(spark, dir)
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_buck LOCATION '/tmp/graft_bucketed/warehouse'")
    val ot = s"graft_buck.orders_$tag"
    val lt = s"graft_buck.lineitem_$tag"
    spark.sql(s"DROP TABLE IF EXISTS $ot")
    spark.sql(s"DROP TABLE IF EXISTS $lt")
    t.orders.select($"o_orderkey", $"o_orderpriority")
      .write.format("parquet").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$base/orders").mode("overwrite").saveAsTable(ot)
    t.lineitem.select($"l_orderkey", revE4.as("rev_e4"))
      .write.format("parquet").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$base/lineitem").mode("overwrite").saveAsTable(lt)
    spark.table(ot)
      .join(spark.table(lt), col("o_orderkey") === col("l_orderkey"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"), sum($"rev_e4").as("rev_e4"))
      .orderBy($"o_orderpriority")
  }

  private val etlBucketedJoinSql =
    s"""SELECT o_orderpriority, count(*) AS n_items,
       |  CAST(sum($revE4Sql) AS BIGINT) AS rev_e4
       |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------- q_prop_ztest

  /** Two-proportion z-test on user conversion between the even/odd
    * experiment cohorts — the completion of the experimentation kit
    * (t on means: `q_ab_test`; U on distributions: `q_mann_whitney`;
    * χ² on contingency: `q_crosstab_chi2`; z on rates: here).
    * "Conversion" = ≥ 14 purchases (the per-user purchase-count
    * median, which is scale-invariant in this lake — "any purchase"
    * saturates at rate 1.0 and the pooled variance degenerates to
    * 0/0). One per-user aggregate, one cohort aggregate — 100 TB
    * reduces to four integers — and the pooled-variance z is a single
    * deterministic double expression mirrored in both engines, CASE-
    * guarded against the all-convert/none-convert degenerate pool.
    */
  def qPropZtest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val s = Tables(spark, dir).events
      .groupBy($"user_id")
      .agg(when(sum(when($"event_type" === "purchase", 1L).otherwise(0L)) >= 14, 1L)
        .otherwise(0L).as("conv"))
      .withColumn("a", $"user_id" % 2 === 0)
      .agg(sum(when($"a", 1L).otherwise(0L)).as("n_a"),
        sum(when($"a", $"conv").otherwise(0L)).as("x_a"),
        sum(when(!$"a", 1L).otherwise(0L)).as("n_b"),
        sum(when(!$"a", $"conv").otherwise(0L)).as("x_b"))
    s.select($"n_a", $"x_a", $"n_b", $"x_b",
      round($"x_a".cast("double") / $"n_a", 6).as("rate_a"),
      round($"x_b".cast("double") / $"n_b", 6).as("rate_b"),
      when($"x_a" + $"x_b" > 0 && $"x_a" + $"x_b" < $"n_a" + $"n_b",
        round(($"x_a".cast("double") / $"n_a" - $"x_b".cast("double") / $"n_b") /
          sqrt((($"x_a" + $"x_b").cast("double") / ($"n_a" + $"n_b")) *
            (lit(1.0) - ($"x_a" + $"x_b").cast("double") / ($"n_a" + $"n_b")) *
            (lit(1.0) / $"n_a" + lit(1.0) / $"n_b")), 4)).as("z_stat"))
  }

  private val qPropZtestSql =
    """WITH u AS (
      |  SELECT user_id,
      |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
      |      THEN 1 ELSE 0 END AS conv
      |  FROM events GROUP BY user_id),
      |s AS (
      |  SELECT
      |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END) AS BIGINT) AS x_a,
      |    CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(sum(CASE WHEN user_id % 2 <> 0 THEN conv ELSE 0 END) AS BIGINT) AS x_b
      |  FROM u)
      |SELECT n_a, x_a, n_b, x_b,
      |  round(CAST(x_a AS DOUBLE) / n_a, 6) AS rate_a,
      |  round(CAST(x_b AS DOUBLE) / n_b, 6) AS rate_b,
      |  CASE WHEN x_a + x_b > 0 AND x_a + x_b < n_a + n_b THEN
      |    round((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b) /
      |      sqrt((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b)) *
      |        (1.0 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b)) *
      |        (1.0 / n_a + 1.0 / n_b)), 4)
      |  END AS z_stat
      |FROM s""".stripMargin

  // --------------------------------------------------------- q_bootstrap_ci

  /** Bootstrap 95% CI for mean daily revenue — 200 deterministic
    * resamples whose Poisson(1)-approximating weights derive from
    * md5(replicate, day), so the oracle replays the identical
    * resampling (the etl_watermark_audit jitter recipe; a seeded RNG
    * would never match across engines). The ×200 fan-out explodes the
    * days-cardinality DAILY aggregate — metadata, never the events —
    * and each replicate mean is an exact integer floor-division, so
    * the order statistics that form the CI compare exact longs.
    */
  def qBootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables(spark, dir).events
      .filter($"event_type" === "purchase")
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(round($"value" * 100).cast("long")).as("cents"))
      .withColumn("point_c", expr("sum(cents) over () div count(1) over ()"))
    val reps = daily
      .select($"day", $"cents", $"point_c",
        explode(sequence(lit(1), lit(200))).as("b"))
      .withColumn("h",
        conv(substring(md5(concat($"b".cast("string"), lit("_"),
          $"day".cast("string"))), 1, 4), 16, 10).cast("long") % 1000)
      // Poisson(1) pmf ≈ .368/.368/.184/.080 → thresholds on h∈[0,1000)
      .withColumn("w",
        when($"h" < 368, 0L).when($"h" < 736, 1L).when($"h" < 920, 2L).otherwise(3L))
      .groupBy($"b")
      .agg(max($"point_c").as("point_c"),
        expr("sum(w * cents) div sum(w)").as("mean_c"))
      .withColumn("r", rank().over(Window.orderBy($"mean_c", $"b")))
    reps.agg(count(lit(1)).as("n_reps"), max($"point_c").as("point_mean_c"),
      max(when($"r" === 5, $"mean_c")).as("ci_lo_c"),
      max(when($"r" === 196, $"mean_c")).as("ci_hi_c"))
  }

  private val qBootstrapCiSql =
    """WITH daily AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |d2 AS (
      |  SELECT day, cents,
      |    CAST(sum(cents) OVER () AS BIGINT) // count(*) OVER () AS point_c
      |  FROM daily),
      |reps AS (
      |  SELECT day, cents, point_c, unnest(range(1, 201)) AS b FROM d2),
      |wts AS (
      |  SELECT b, cents, point_c,
      |    CAST(('0x' || substr(md5(CAST(b AS VARCHAR) || '_' || CAST(day AS VARCHAR)), 1, 4))
      |      AS BIGINT) % 1000 AS h
      |  FROM reps),
      |ws AS (
      |  SELECT b, cents, point_c,
      |    CASE WHEN h < 368 THEN 0 WHEN h < 736 THEN 1
      |      WHEN h < 920 THEN 2 ELSE 3 END AS w
      |  FROM wts),
      |means AS (
      |  SELECT b, max(point_c) AS point_c,
      |    CAST(sum(w * cents) AS BIGINT) // CAST(sum(w) AS BIGINT) AS mean_c
      |  FROM ws GROUP BY b),
      |ranked AS (
      |  SELECT b, point_c, mean_c, rank() OVER (ORDER BY mean_c, b) AS r FROM means)
      |SELECT count(*) AS n_reps, CAST(max(point_c) AS BIGINT) AS point_mean_c,
      |  CAST(max(CASE WHEN r = 5 THEN mean_c END) AS BIGINT) AS ci_lo_c,
      |  CAST(max(CASE WHEN r = 196 THEN mean_c END) AS BIGINT) AS ci_hi_c
      |FROM ranked""".stripMargin

  // -------------------------------------------------------- q_diff_in_diff

  /** Difference-in-differences: the 2×2 (cohort × pre/post) grid of
    * mean purchase value and the DiD interaction estimate — the
    * quasi-experimental read when there is no randomized control.
    * The period split is the midpoint day derived from the DAILY
    * cohort aggregate (a window over day-cardinality metadata, never
    * the events); each cell mean divides exact integer cents by an
    * exact count, pre-ROUNDED to 4 decimals before the final
    * subtraction chain (the q_ab_test recipe).
    */
  def qDiffInDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables(spark, dir).events
      .filter($"event_type" === "purchase")
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"),
        ($"user_id" % 2 === 0).as("a"))
      .agg(count(lit(1)).as("n"), sum(round($"value" * 100).cast("long")).as("cents"))
      .withColumn("split", expr("(min(day) over () + max(day) over ()) div 2"))
      .withColumn("post", $"day" > $"split")
      .groupBy($"a", $"post")
      .agg(max($"split").as("split"), sum($"n").as("n"), sum($"cents").as("cents"))
      .withColumn("mean4", round($"cents".cast("double") / (lit(100.0) * $"n"), 4))
    cells.agg(
        max($"split").as("split_day"),
        max(when($"a" && !$"post", $"mean4")).as("mean_a_pre"),
        max(when($"a" && $"post", $"mean4")).as("mean_a_post"),
        max(when(!$"a" && !$"post", $"mean4")).as("mean_b_pre"),
        max(when(!$"a" && $"post", $"mean4")).as("mean_b_post"))
      .select($"split_day", $"mean_a_pre", $"mean_a_post", $"mean_b_pre", $"mean_b_post",
        round(($"mean_a_post" - $"mean_a_pre") - ($"mean_b_post" - $"mean_b_pre"), 4)
          .as("did_estimate"))
  }

  private val qDiffInDiffSql =
    """WITH daily AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day, user_id % 2 = 0 AS a,
      |    count(*) AS n, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |sp AS (
      |  SELECT a, day > split AS post, n, cents, split FROM (
      |    SELECT *, (min(day) OVER () + max(day) OVER ()) // 2 AS split FROM daily)),
      |cells AS (
      |  SELECT a, post, max(split) AS split, CAST(sum(n) AS BIGINT) AS n,
      |    CAST(sum(cents) AS BIGINT) AS cents
      |  FROM sp GROUP BY 1, 2),
      |m AS (
      |  SELECT a, post, split,
      |    round(CAST(cents AS DOUBLE) / (100.0 * n), 4) AS mean4
      |  FROM cells)
      |SELECT max(split) AS split_day,
      |  max(CASE WHEN a AND NOT post THEN mean4 END) AS mean_a_pre,
      |  max(CASE WHEN a AND post THEN mean4 END) AS mean_a_post,
      |  max(CASE WHEN NOT a AND NOT post THEN mean4 END) AS mean_b_pre,
      |  max(CASE WHEN NOT a AND post THEN mean4 END) AS mean_b_post,
      |  round((max(CASE WHEN a AND post THEN mean4 END)
      |    - max(CASE WHEN a AND NOT post THEN mean4 END))
      |    - (max(CASE WHEN NOT a AND post THEN mean4 END)
      |    - max(CASE WHEN NOT a AND NOT post THEN mean4 END)), 4) AS did_estimate
      |FROM m""".stripMargin

  // ---------------------------------------------------- q_price_elasticity

  /** Price elasticity of demand per part brand: the log-log
    * regression slope of quantity on realized unit price across that
    * brand's line items — the econometric pricing read. Unit price is
    * an exact integer floor-division (cents div quantity — never a
    * double divide), both ln inputs nano-quantize BEFORE the
    * regression (the text_zipf_fit recipe), and `regr_slope`/`regr_r2`
    * reduce to map-side-combinable co-moments. The part join carries
    * only (partkey, brand) — pruned to two columns at the scan.
    */
  def qPriceElasticity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    t.lineitem
      .select($"l_partkey", round($"l_quantity").cast("long").as("qty"),
        (round($"l_extendedprice" * 100).cast("long")).as("cents"))
      .filter($"qty" > 0)
      .withColumn("unit_c", expr("cents div qty"))
      // unit_c = 0 is possible on data without TPC-H's price floor
      // (cents < qty); ln(0) = -Inf would cast to Long.MinValue in
      // Spark but ERROR in DuckDB's CAST — guard both engines out
      .filter($"unit_c" > 0)
      .join(t.part.select($"p_partkey", $"p_brand"), $"l_partkey" === $"p_partkey")
      .withColumn("lnq", round(log($"qty".cast("double")) * 1e9).cast("long") / 1e9)
      .withColumn("lnp", round(log($"unit_c".cast("double")) * 1e9).cast("long") / 1e9)
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_lines"),
        round(expr("regr_slope(lnq, lnp)"), 4).as("elasticity"),
        round(expr("regr_r2(lnq, lnp)"), 4).as("r2"))
      .orderBy($"p_brand")
  }

  private val qPriceElasticitySql =
    """WITH li AS (
      |  SELECT l_partkey, CAST(round(l_quantity) AS BIGINT) AS qty,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      |  FROM lineitem WHERE CAST(round(l_quantity) AS BIGINT) > 0),
      |u AS (
      |  SELECT p_brand,
      |    CAST(round(ln(CAST(qty AS DOUBLE)) * 1e9) AS BIGINT) / 1e9 AS lnq,
      |    CAST(round(ln(CAST(cents // qty AS DOUBLE)) * 1e9) AS BIGINT) / 1e9 AS lnp
      |  FROM li JOIN part ON l_partkey = p_partkey
      |  WHERE cents // qty > 0)
      |SELECT p_brand, count(*) AS n_lines,
      |  round(regr_slope(lnq, lnp), 4) AS elasticity,
      |  round(regr_r2(lnq, lnp), 4) AS r2
      |FROM u GROUP BY 1 ORDER BY p_brand""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("q_diff_in_diff", qDiffInDiff _, qDiffInDiffSql),
    QueryDef.sql("q_price_elasticity", qPriceElasticity _, qPriceElasticitySql),
    QueryDef.sql("q_prop_ztest", qPropZtest _, qPropZtestSql),
    QueryDef.sql("q_bootstrap_ci", qBootstrapCi _, qBootstrapCiSql),
    QueryDef.sql("q_hhi", qHhi _, qHhiSql),
    QueryDef.sql("q_theil_index", qTheilIndex _, qTheilIndexSql),
    QueryDef.sql("q_spearman_corr", qSpearmanCorr _, qSpearmanCorrSql),
    QueryDef.sql("q_mann_whitney", qMannWhitney _, qMannWhitneySql),
    QueryDef.sql("q_anova_f", qAnovaF _, qAnovaFSql),
    QueryDef.sql("q_runs_test", qRunsTest _, qRunsTestSql),
    QueryDef.sql("ts_cusum", tsCusum _, tsCusumSql),
    QueryDef.sql("etl_bucketed_join", etlBucketedJoin _, etlBucketedJoinSql))
}

/** One JVM-exit cleanup of the app-scoped bucketed-layout root —
  * registered (once) by [[InferQ.etlBucketedJoin]]. Deletion cannot
  * happen inside the gate itself: the returned plan is lazy and reads
  * the bucketed tables when the CALLER materializes it, so the files
  * must outlive the call. Best-effort by design (a shared /tmp may
  * outrace us); the per-app path guarantees we only ever delete our
  * own artifacts.
  */
private[queries] object BucketedJoinCleanup {
  private val registered = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def register(root: String): Unit =
    if (registered.add(root)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => delete(new java.io.File(root))))
    }
  private def delete(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(delete)
    f.delete(): Unit
  }
}
