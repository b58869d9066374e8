package graft.queries

import graft.Tables
import graft.operators.TopK
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 wave U — lake-infrastructure analytics: a KMV (k-minimum-
  * values / theta) distinct sketch — THE mergeable cross-partition
  * cardinality sketch families like DataSketches build on — emitted
  * beside the exact count as the contract (the bitmap_distinct
  * pattern); zone-map pruning statistics (what data skipping would
  * save for the canonical date-range predicate); and a monthly
  * Little's-law decomposition (L = λW with boundary carryover made
  * visible).
  *
  * Scale design: the KMV heap is a bounded per-group TopK (native
  * GroupTopK tier — partitions×groups×64 rows shuffle, never the
  * stream); zone maps are month-cardinality min/max aggregates —
  * exactly the metadata a lake writer keeps; Little's law explodes
  * each order into the ≤4 months it spans (output-proportional, no
  * day-level grid).
  */
object InfraQ {

  // --------------------------------------------------------- q_theta_sketch
  /** KMV distinct estimate per event type: keep the 64 smallest
    * md5-derived 52-bit hashes of the user id; the estimate is
    * (k−1)/h₍ₖ₎ with h₍ₖ₎ read as a fraction of 16¹³. md5 replays
    * exactly in the oracle, so estimate AND error are gate-hashed.
    * Saturation guard: a group with < 64 distinct users reports its
    * exact count (the sketch is exact below k).
    */
  def qThetaSketch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables(spark, dir).events
      .select($"event_type", $"user_id").distinct()
      .withColumn("hv",
        conv(substring(md5($"user_id".cast("string")), 1, 13), 16, 10)
          .cast("long"))
    val exact = d.groupBy($"event_type").agg(count(lit(1)).as("n_exact"))
    val kmv = TopK(d, Seq($"event_type"), Seq($"hv".asc, $"user_id"), 64)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_kept"), max($"hv").as("kth"))
    kmv.join(exact, "event_type")
      .select($"event_type", $"n_exact",
        expr("""CASE WHEN n_kept < 64 THEN n_kept
          |ELSE CAST(round(63 * 4.503599627370496e15 / kth) AS BIGINT) END"""
          .stripMargin.replace("\n", " ")).as("n_est"),
        expr("""round(100 * abs(CAST((CASE WHEN n_kept < 64 THEN n_kept
          |ELSE CAST(round(63 * 4.503599627370496e15 / kth) AS BIGINT) END) - n_exact
          |AS DOUBLE)) / n_exact, 2)"""
          .stripMargin.replace("\n", " ")).as("rel_err_pct"))
      .orderBy($"event_type")
  }

  private val qThetaSketchSql =
    """WITH d AS (
      |  SELECT DISTINCT event_type, user_id FROM events),
      |h AS (
      |  SELECT event_type, user_id,
      |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13)) AS BIGINT) AS hv
      |  FROM d),
      |r AS (
      |  SELECT event_type, hv,
      |    row_number() OVER (PARTITION BY event_type ORDER BY hv, user_id) AS rk
      |  FROM h),
      |kmv AS (
      |  SELECT event_type, count(*) AS n_kept, CAST(max(hv) AS BIGINT) AS kth
      |  FROM r WHERE rk <= 64 GROUP BY event_type),
      |ex AS (SELECT event_type, count(*) AS n_exact FROM d GROUP BY event_type)
      |SELECT event_type, n_exact,
      |  CASE WHEN n_kept < 64 THEN n_kept ELSE CAST(round(63 * 4.503599627370496e15 / kth) AS BIGINT) END AS n_est,
      |  round(100 * abs(CAST((CASE WHEN n_kept < 64 THEN n_kept ELSE CAST(round(63 * 4.503599627370496e15 / kth) AS BIGINT) END) - n_exact AS DOUBLE)) / n_exact, 2) AS rel_err_pct
      |FROM kmv JOIN ex USING (event_type) ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------ etl_zone_map
  /** Zone maps (file-skipping metadata): per ship-month min/max of the
    * day and price columns plus the would-scan verdict for the
    * canonical half-year date-range predicate — and the global scan
    * fraction data skipping achieves. This is the min/max pruning a
    * parquet/iceberg writer gets from sorted layout, measured as a
    * query.
    */
  def etlZoneMap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables(spark, dir).lineitem
      .select(expr("CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)").as("mkey"),
        expr("unix_micros(l_shipdate) div 86400000000").as("day"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
    val zones = li.groupBy($"mkey")
      .agg(count(lit(1)).as("n_rows"), min($"day").as("day_min"),
        max($"day").as("day_max"), min($"cents").as("cents_min"),
        max($"cents").as("cents_max"))
    val bounds = zones.agg(min($"day_min").as("d0"))
    val flagged = zones.crossJoin(broadcast(bounds))
      .withColumn("would_scan",
        $"day_max" >= $"d0" + 180 && $"day_min" < $"d0" + 360)
    val frac = flagged.agg(
      sum(when($"would_scan", 1L).otherwise(0L)).as("scanned"),
      count(lit(1)).as("months"))
    flagged.crossJoin(broadcast(frac))
      .select($"mkey", $"n_rows", $"day_min", $"day_max",
        $"cents_min", $"cents_max", $"would_scan",
        expr("round(CAST(scanned AS DOUBLE) / months, 4)").as("scan_fraction"))
      .orderBy($"mkey")
  }

  private val etlZoneMapSql =
    """WITH li AS (
      |  SELECT year(l_shipdate) * 100 + month(l_shipdate) AS mkey,
      |    epoch_us(l_shipdate) // 86400000000 AS day,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      |  FROM lineitem),
      |z AS (
      |  SELECT mkey, count(*) AS n_rows, min(day) AS day_min, max(day) AS day_max,
      |    min(cents) AS cents_min, max(cents) AS cents_max
      |  FROM li GROUP BY mkey),
      |b AS (SELECT min(day_min) AS d0 FROM z),
      |f AS (
      |  SELECT z.*, day_max >= d0 + 180 AND day_min < d0 + 360 AS would_scan
      |  FROM z, b),
      |s AS (
      |  SELECT CAST(sum(CASE WHEN would_scan THEN 1 ELSE 0 END) AS BIGINT) AS scanned,
      |    count(*) AS months
      |  FROM f)
      |SELECT mkey, n_rows, day_min, day_max, cents_min, cents_max, would_scan,
      |  round(CAST(scanned AS DOUBLE) / months, 4) AS scan_fraction
      |FROM f, s ORDER BY mkey""".stripMargin

  // ------------------------------------------------------------ q_little_law
  /** Monthly Little's law: arrivals λ, mean time-in-system W of the
    * month's arrivals, and average work-in-progress L measured from
    * interval overlap — the gap between L and λW is exactly the
    * cross-month carryover. Orders explode into the months they span
    * (bounded by the ship horizon), so the grid never materializes
    * day-level rows.
    */
  def qLittleLaw(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val span = t.lineitem
      .groupBy($"l_orderkey")
      .agg(max(expr("unix_micros(l_shipdate) div 86400000000")).as("eday"))
      .join(t.orders.select($"o_orderkey",
        expr("unix_micros(o_orderdate) div 86400000000").as("oday")),
        $"l_orderkey" === $"o_orderkey")
      // the synthetic lake ships some lines BEFORE the order date; an
      // order is in-system at least the day it arrives (and Spark's
      // sequence(a,b) would silently run DESCENDING on a > b where
      // DuckDB's generate_series returns empty — clamp on both engines)
      .withColumn("eday", greatest($"eday", $"oday"))
    val d0 = span.agg(min($"oday").as("d0"))
    val m = span.crossJoin(broadcast(d0))
      .withColumn("m", explode(sequence(
        expr("(oday - d0) div 30"), expr("(eday - d0) div 30"))))
      .withColumn("overlap", expr(
        "least(eday + 1, d0 + (m + 1) * 30) - greatest(oday, d0 + m * 30)"))
      .withColumn("arrived", expr("(oday - d0) div 30") === $"m")
    m.groupBy($"m")
      .agg(sum(when($"arrived", 1L).otherwise(0L)).as("arrivals"),
        sum(when($"arrived", $"eday" + 1 - $"oday").otherwise(0L)).as("dur_sum"),
        sum($"overlap").as("overlap_sum"))
      .select($"m", $"arrivals",
        expr("round(CAST(arrivals AS DOUBLE) / 30, 4)").as("lambda_d"),
        expr("round(CAST(dur_sum AS DOUBLE) / nullif(arrivals, 0), 4)").as("w_days"),
        expr("round(CAST(overlap_sum AS DOUBLE) / 30, 4)").as("l_avg"),
        expr("""round(CAST(overlap_sum AS DOUBLE) / 30 -
          |(CAST(arrivals AS DOUBLE) / 30) * (CAST(dur_sum AS DOUBLE) / nullif(arrivals, 0)), 4)"""
          .stripMargin.replace("\n", " ")).as("little_gap"))
      .orderBy($"m")
  }

  private val qLittleLawSql =
    """WITH span AS (
      |  SELECT o.o_orderkey, epoch_us(o.o_orderdate) // 86400000000 AS oday,
      |    greatest(s.eday, epoch_us(o.o_orderdate) // 86400000000) AS eday
      |  FROM orders o JOIN (
      |    SELECT l_orderkey, max(epoch_us(l_shipdate) // 86400000000) AS eday
      |    FROM lineitem GROUP BY 1) s ON s.l_orderkey = o.o_orderkey),
      |b AS (SELECT min(oday) AS d0 FROM span),
      |e AS (
      |  SELECT oday, eday, d0, unnest(generate_series((oday - d0) // 30, (eday - d0) // 30)) AS m
      |  FROM span, b),
      |o AS (
      |  SELECT m,
      |    least(eday + 1, d0 + (m + 1) * 30) - greatest(oday, d0 + m * 30) AS overlap,
      |    (oday - d0) // 30 = m AS arrived, eday + 1 - oday AS dur
      |  FROM e),
      |g AS (
      |  SELECT m, CAST(sum(CASE WHEN arrived THEN 1 ELSE 0 END) AS BIGINT) AS arrivals,
      |    CAST(sum(CASE WHEN arrived THEN dur ELSE 0 END) AS BIGINT) AS dur_sum,
      |    CAST(sum(overlap) AS BIGINT) AS overlap_sum
      |  FROM o GROUP BY m)
      |SELECT m, arrivals,
      |  round(CAST(arrivals AS DOUBLE) / 30, 4) AS lambda_d,
      |  round(CAST(dur_sum AS DOUBLE) / nullif(arrivals, 0), 4) AS w_days,
      |  round(CAST(overlap_sum AS DOUBLE) / 30, 4) AS l_avg,
      |  round(CAST(overlap_sum AS DOUBLE) / 30 - (CAST(arrivals AS DOUBLE) / 30) * (CAST(dur_sum AS DOUBLE) / nullif(arrivals, 0)), 4) AS little_gap
      |FROM g ORDER BY m""".stripMargin

  // ---------------------------------------------------------------- registry

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("q_theta_sketch", qThetaSketch _, qThetaSketchSql),
    QueryDef.sql("etl_zone_map", etlZoneMap _, etlZoneMapSql),
    QueryDef.sql("q_little_law", qLittleLaw _, qLittleLawSql))
}
