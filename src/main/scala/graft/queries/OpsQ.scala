package graft.queries

import graft.Tables
import graft.operators.PrefixSum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 wave — operational analytics: year-over-year growth, ABC
  * (Pareto) inventory classification, and the order-to-ship latency
  * profile. All three reduce to aggregated metadata before any
  * ordered pass (the etl_binpack planner shape), so the serial parts
  * touch months / distinct revenue values / distinct day-counts —
  * never rows.
  */
object OpsQ {

  // ----------------------------------------------------------- q_mom_growth

  /** Month-over-month growth of monthly revenue per event type.
    * Monthly cents are exact longs; the lag is a window over the
    * AGGREGATED monthly series (months × types rows, partitioned by
    * type — bounded and parallel); growth is one division of exact
    * longs rounded once. The calendar convention is the lake's
    * day-div-30 month (q_stickiness precedent); a longer-horizon lake
    * sets the lag to 12 for year-over-year.
    */
  def qMomGrowth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val monthly = Tables(spark, dir).events
      .groupBy($"event_type",
        expr("unix_micros(ts) div 86400000000 div 30").as("month"))
      .agg(sum(round($"value" * 100).cast("long")).as("cents"))
    val w = Window.partitionBy($"event_type").orderBy($"month")
    monthly
      .withColumn("prev_cents", lag($"cents", 1).over(w))
      .filter($"prev_cents".isNotNull && $"prev_cents" > 0)
      .select($"event_type", $"month", $"cents", $"prev_cents",
        round(($"cents" - $"prev_cents") * 100.0 / $"prev_cents", 4).as("mom_pct"))
      .orderBy($"event_type", $"month")
  }

  private val qMomGrowthSql =
    """WITH m AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 // 30 AS month,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |l AS (
      |  SELECT event_type, month, cents,
      |    lag(cents, 1) OVER (PARTITION BY event_type ORDER BY month) AS prev_cents
      |  FROM m)
      |SELECT event_type, month, cents, prev_cents,
      |  round((cents - prev_cents) * 100.0 / prev_cents, 4) AS mom_pct
      |FROM l WHERE prev_cents IS NOT NULL AND prev_cents > 0
      |ORDER BY event_type, month""".stripMargin

  // -------------------------------------------------------- q_abc_analysis

  /** ABC (Pareto) classification of parts by lineitem revenue: class
    * A holds the top values covering ≤80% of cumulative revenue, B to
    * ≤95%, C the tail. The global ordered pass runs over DISTINCT
    * per-part revenue VALUES (value-grouped counts through PrefixSum's
    * bucket-offset scheme — the serial step sees per-bucket totals
    * only), class boundaries are INTEGER comparisons (5·cum ≤ 4·total
    * for 80%, 20·cum ≤ 19·total for 95% — no FP in the cut), and ties
    * land in one class deterministically because classification is by
    * value, not by row. Revenue stays in exact 1e-4-dollar longs
    * end to end.
    */
  def qAbcAnalysis(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val revE4 = round($"l_extendedprice" * 100).cast("long") *
      (lit(100L) - round($"l_discount" * 100).cast("long"))
    val perPart = Tables(spark, dir).lineitem
      .groupBy($"l_partkey").agg(sum(revE4).as("rev"))
    val byVal = perPart.groupBy($"rev")
      .agg(count(lit(1)).as("n_parts"))
      .withColumn("val_rev", $"rev" * $"n_parts")
      .withColumn("negv", -$"rev")
    val cum = PrefixSum.running(byVal, $"negv",
      floor(asinh($"negv".cast("double")) * 8).cast("long"),
      Seq("val_rev" -> $"val_rev"))
    val total = byVal.agg(sum($"val_rev").as("t"))
    cum.crossJoin(broadcast(total))
      .withColumn("abc_class",
        when($"cum_val_rev" * 5 <= $"t" * 4, "A")
          .when($"cum_val_rev" * 20 <= $"t" * 19, "B")
          .otherwise("C"))
      .groupBy($"abc_class")
      .agg(sum($"n_parts").as("n_parts"), sum($"val_rev").as("rev_e4"))
      .crossJoin(broadcast(total))
      .select($"abc_class", $"n_parts", $"rev_e4",
        round($"rev_e4" / $"t".cast("double"), 6).as("rev_share"))
      .orderBy($"abc_class")
  }

  private val qAbcAnalysisSql =
    """WITH pp AS (
      |  SELECT l_partkey,
      |    CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
      |      * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS rev
      |  FROM lineitem GROUP BY 1),
      |bv AS (
      |  SELECT rev, count(*) AS n_parts, CAST(rev * count(*) AS BIGINT) AS val_rev
      |  FROM pp GROUP BY 1),
      |c AS (
      |  SELECT rev, n_parts, val_rev,
      |    CAST(sum(val_rev) OVER (ORDER BY rev DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM bv),
      |t AS (SELECT CAST(sum(val_rev) AS BIGINT) AS t FROM bv),
      |cl AS (
      |  SELECT CASE WHEN cum * 5 <= t * 4 THEN 'A'
      |              WHEN cum * 20 <= t * 19 THEN 'B'
      |              ELSE 'C' END AS abc_class,
      |    n_parts, val_rev, t
      |  FROM c, t)
      |SELECT abc_class, CAST(sum(n_parts) AS BIGINT) AS n_parts,
      |  CAST(sum(val_rev) AS BIGINT) AS rev_e4,
      |  round(CAST(sum(val_rev) AS BIGINT) / CAST(max(t) AS DOUBLE), 6) AS rev_share
      |FROM cl GROUP BY 1 ORDER BY abc_class""".stripMargin

  // -------------------------------------------------------- q_ship_latency

  /** Order-to-ship latency profile per order priority: exact p50 /
    * p90 / p99 of the ship-minus-order day gap plus the mean — the
    * fulfillment SLA report. Latency is a small integer (days), so
    * the exact percentile aggregate's per-group state is bounded by
    * the number of DISTINCT latencies (~120), not row count — the
    * one case where the built-in exact percentile is already the
    * at-scale plan. Mean is an exact integer division rounded once.
    */
  def qShipLatency(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val d = t.lineitem
      .select($"l_orderkey",
        expr("unix_micros(cast(l_shipdate as timestamp)) div 86400000000").as("shipday"))
      .join(t.orders.select($"o_orderkey", $"o_orderpriority",
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("orderday")),
        $"l_orderkey" === $"o_orderkey")
      .select($"o_orderpriority", ($"shipday" - $"orderday").as("lat"))
    d.groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        round(percentile($"lat", lit(0.5)), 4).as("p50"),
        round(percentile($"lat", lit(0.9)), 4).as("p90"),
        round(percentile($"lat", lit(0.99)), 4).as("p99"),
        round(sum($"lat") / count(lit(1)).cast("double"), 4).as("avg_days"))
      .orderBy($"o_orderpriority")
  }

  private val qShipLatencySql =
    """WITH d AS (
      |  SELECT o_orderpriority,
      |    epoch_us(l_shipdate) // 86400000000 - epoch_us(o_orderdate) // 86400000000 AS lat
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      |SELECT o_orderpriority, count(*) AS n_lines,
      |  round(quantile_cont(lat, 0.5), 4) AS p50,
      |  round(quantile_cont(lat, 0.9), 4) AS p90,
      |  round(quantile_cont(lat, 0.99), 4) AS p99,
      |  round(CAST(sum(lat) AS BIGINT) / CAST(count(*) AS DOUBLE), 4) AS avg_days
      |FROM d GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  // ------------------------------------------------------- q_xyz_analysis
  /** XYZ demand-variability classification — ABC's standard companion
    * (`q_abc_analysis` ranks by value; XYZ classes by predictability):
    * per-part coefficient of variation of monthly shipped quantity,
    * X (CV < 0.5, steady) / Y (< 1.0) / Z (erratic). Monthly demand
    * is integer quantities; mean/std round to 4 decimals BEFORE the
    * CV division (the q_ab_test recipe); parts shipping in a single
    * month have undefined variability and class as Z by convention.
    * Two bounded aggregates: (part × month), then part, then the
    * 3-row class table.
    */
  def qXyzAnalysis(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pm = Tables(spark, dir).lineitem
      .groupBy($"l_partkey".as("part"),
        expr("unix_micros(l_shipdate) div 2592000000000").as("m"))
      .agg(expr("CAST(sum(l_quantity) AS BIGINT)").as("q"))
    val per = pm.groupBy($"part")
      .agg(count(lit(1)).as("n"), sum($"q").as("s"), sum($"q" * $"q").as("ss"))
      .withColumn("mu", expr("round(CAST(s AS DOUBLE) / n, 4)"))
      .withColumn("sd", expr(
        "CASE WHEN n > 1 THEN round(sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)), 4) END"))
      .withColumn("cls", expr(
        """CASE WHEN n <= 1 THEN 'Z'
          |WHEN sd / mu < 0.5 THEN 'X' WHEN sd / mu < 1.0 THEN 'Y'
          |ELSE 'Z' END""".stripMargin.replace("\n", " ")))
    per.groupBy($"cls")
      .agg(count(lit(1)).as("n_parts"),
        expr("CAST(round(avg(CASE WHEN n > 1 THEN sd / mu END) * 1e4) AS BIGINT)").as("mean_cv_e4"))
      .crossJoin(broadcast(per.agg(count(lit(1)).as("total"))))
      .select($"cls", $"n_parts",
        expr("round(CAST(n_parts AS DOUBLE) / total, 4)").as("share"),
        expr("round(mean_cv_e4 / 1e4, 4)").as("mean_cv"))
      .orderBy($"cls")
  }

  private val qXyzAnalysisSql =
    """WITH pm AS (
      |  SELECT l_partkey AS part, epoch_us(l_shipdate) // 2592000000000 AS m,
      |    CAST(sum(l_quantity) AS BIGINT) AS q
      |  FROM lineitem GROUP BY 1, 2),
      |per AS (
      |  SELECT part, count(*) AS n, CAST(sum(q) AS BIGINT) AS s,
      |    CAST(sum(q * q) AS BIGINT) AS ss
      |  FROM pm GROUP BY part),
      |cv AS (
      |  SELECT *,
      |    round(CAST(s AS DOUBLE) / n, 4) AS mu,
      |    CASE WHEN n > 1 THEN round(sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)), 4) END AS sd
      |  FROM per),
      |cl AS (
      |  SELECT *, CASE WHEN n <= 1 THEN 'Z'
      |    WHEN sd / mu < 0.5 THEN 'X' WHEN sd / mu < 1.0 THEN 'Y'
      |    ELSE 'Z' END AS cls
      |  FROM cv),
      |g AS (
      |  SELECT cls, count(*) AS n_parts,
      |    CAST(round(avg(CASE WHEN n > 1 THEN sd / mu END) * 1e4) AS BIGINT) AS mean_cv_e4
      |  FROM cl GROUP BY cls),
      |t AS (SELECT count(*) AS total FROM cl)
      |SELECT cls, n_parts,
      |  round(CAST(n_parts AS DOUBLE) / total, 4) AS share,
      |  round(mean_cv_e4 / 1e4, 4) AS mean_cv
      |FROM g, t ORDER BY cls""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("q_mom_growth", qMomGrowth _, qMomGrowthSql),
    QueryDef.sql("q_abc_analysis", qAbcAnalysis _, qAbcAnalysisSql),
    QueryDef.sql("q_ship_latency", qShipLatency _, qShipLatencySql),
    QueryDef.sql("q_xyz_analysis", qXyzAnalysis _, qXyzAnalysisSql))
}
