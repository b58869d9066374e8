package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 data-quality / time-series / frontier additions: per-column
  * profiling, robust (IQR) outlier detection, gap-filled resampling
  * with last-observation-carried-forward, and a distributed skyline.
  * Each gate has an exact DuckDB oracle.
  */
object QualityQ {

  private val NumCols = Seq("c_custkey", "c_nationkey", "c_acctbal")
  private val StrCols = Seq("c_name", "c_mktsegment")

  /** Per-column profile of `customer` — the data-quality primitive
    * every intake pipeline runs first: row/null/distinct counts plus
    * typed min/max per column, in ONE aggregate pass (the multi-
    * distinct agg plans as one Expand — a deliberate #cols× map-side
    * multiplication, cheaper at 100 TB than #cols separate scans; a
    * cardinality-only profile would swap count_distinct for HLL and
    * drop the Expand entirely — that variant is `q_approx_distinct`).
    * The one-row aggregate then explodes to a (column → stats) long
    * table in-plan: no collect, no loop over columns on the driver.
    */
  def etlProfile(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir).customer
    val all = NumCols ++ StrCols
    val aggs: Seq[Column] =
      count(lit(1)).as("n_rows") +:
        (all.flatMap { k =>
          Seq(sum(when(col(k).isNull, 1L).otherwise(0L)).as(s"${k}__nn"),
            countDistinct(col(k)).as(s"${k}__nd"))
        } ++
          NumCols.flatMap { k =>
            Seq(min(col(k)).cast("double").as(s"${k}__mn"),
              max(col(k)).cast("double").as(s"${k}__mx"))
          } ++
          StrCols.flatMap { k =>
            Seq(min(col(k)).as(s"${k}__smn"), max(col(k)).as(s"${k}__smx"))
          })
    val one = c.agg(aggs.head, aggs.tail: _*)
    val rows = all.map { k =>
      val isNum = NumCols.contains(k)
      struct(
        lit(k).as("col_name"),
        col("n_rows"),
        col(s"${k}__nn").as("n_null"),
        col(s"${k}__nd").as("n_distinct"),
        (if (isNum) col(s"${k}__mn") else lit(null).cast("double")).as("min_num"),
        (if (isNum) col(s"${k}__mx") else lit(null).cast("double")).as("max_num"),
        (if (isNum) lit(null).cast("string") else col(s"${k}__smn")).as("min_str"),
        (if (isNum) lit(null).cast("string") else col(s"${k}__smx")).as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
      .orderBy(col("col_name"))
  }

  private val etlProfileSql = {
    def numRow(k: String) =
      s"""SELECT '$k' AS col_name, count(*) AS n_rows,
         |  count(*) - count($k) AS n_null, count(DISTINCT $k) AS n_distinct,
         |  CAST(min($k) AS DOUBLE) AS min_num, CAST(max($k) AS DOUBLE) AS max_num,
         |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
         |FROM customer""".stripMargin
    def strRow(k: String) =
      s"""SELECT '$k' AS col_name, count(*) AS n_rows,
         |  count(*) - count($k) AS n_null, count(DISTINCT $k) AS n_distinct,
         |  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
         |  min($k) AS min_str, max($k) AS max_str
         |FROM customer""".stripMargin
    (NumCols.map(numRow) ++ StrCols.map(strRow))
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** Robust per-group outlier detection: Tukey fences per event type —
    * values outside [q1 − 1.5·IQR, q3 + 1.5·IQR] of their own type.
    * One exact-percentile aggregate produces the type-cardinality
    * fence table; the join back carries NO broadcast hint (group
    * cardinality is unbounded in general — the tfidf lesson; AQE
    * broadcasts when it measures small) and the flag filter is
    * shuffle-free. Fence arithmetic is stated identically on both
    * engines, so the unrounded comparison is bit-exact (the exact
    * percentile parity is already pinned by `q_percentiles`).
    */
  def qOutlierIqr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, dir).events
    val fences = e.groupBy($"event_type").agg(
        expr("percentile(value, 0.25)").as("q1"),
        expr("percentile(value, 0.75)").as("q3"))
      .select($"event_type",
        ($"q1" - ($"q3" - $"q1") * 1.5).as("lo"),
        ($"q3" + ($"q3" - $"q1") * 1.5).as("hi"))
    e.join(fences, "event_type")
      .filter($"value" < $"lo" || $"value" > $"hi")
      .select($"event_id", $"event_type", $"value",
        round($"lo", 4).as("lo"), round($"hi", 4).as("hi"))
      .orderBy($"event_id")
  }

  private val qOutlierIqrSql =
    """WITH f AS (
      |  SELECT event_type,
      |    quantile_cont(value, 0.25) - (quantile_cont(value, 0.75) - quantile_cont(value, 0.25)) * 1.5 AS lo,
      |    quantile_cont(value, 0.75) + (quantile_cont(value, 0.75) - quantile_cont(value, 0.25)) * 1.5 AS hi
      |  FROM events GROUP BY event_type)
      |SELECT e.event_id, e.event_type, e.value,
      |  round(f.lo, 4) AS lo, round(f.hi, 4) AS hi
      |FROM events e JOIN f USING (event_type)
      |WHERE e.value < f.lo OR e.value > f.hi
      |ORDER BY e.event_id""".stripMargin

  /** Gap-filled hourly resample with last-observation-carried-forward
    * (the time-series densification every monitoring/feature pipeline
    * needs): per-user purchase values bucket to hours, each user's
    * grid spans their own [min, max] bucket (the explode is bounded
    * per key by that key's span — never a global calendar cross
    * join), and missing buckets fill from the last observed value via
    * one ordered window. The bucket aggregate, span aggregate, grid
    * join and LOCF window all share the user_id shuffle key.
    */
  def qGapFill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, dir).events
      .filter($"user_id" < 10 && $"event_type" === "purchase")
    val b = e.groupBy($"user_id",
        expr("unix_micros(ts) div 3600000000").as("h"))
      .agg(round(sum($"value"), 4).as("v_obs"), count(lit(1)).as("n_events"))
    val grid = b.groupBy($"user_id").agg(min($"h").as("h0"), max($"h").as("h1"))
      .select($"user_id", explode(sequence($"h0", $"h1")).as("h"))
    val w = Window.partitionBy($"user_id").orderBy($"h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(b, Seq("user_id", "h"), "left")
      .select($"user_id", $"h".as("hour_bucket"),
        last($"v_obs", ignoreNulls = true).over(w).as("v_filled"),
        $"v_obs".isNull.as("is_gap"),
        coalesce($"n_events", lit(0L)).as("n_events"))
      .orderBy($"user_id", $"hour_bucket")
  }

  private val qGapFillSql =
    """WITH b AS (
      |  SELECT user_id, epoch_us(ts) // 3600000000 AS h,
      |    round(sum(value), 4) AS v_obs, count(*) AS n_events
      |  FROM events WHERE user_id < 10 AND event_type = 'purchase'
      |  GROUP BY 1, 2),
      |g AS (SELECT user_id, unnest(range(min(h), max(h) + 1)) AS h
      |      FROM b GROUP BY user_id)
      |SELECT g.user_id, g.h AS hour_bucket,
      |  last_value(b.v_obs IGNORE NULLS) OVER (
      |    PARTITION BY g.user_id ORDER BY g.h
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
      |  b.v_obs IS NULL AS is_gap,
      |  coalesce(b.n_events, 0) AS n_events
      |FROM g LEFT JOIN b ON b.user_id = g.user_id AND b.h = g.h
      |ORDER BY g.user_id, hour_bucket""".stripMargin

  /** Skyline / Pareto frontier of the part catalog: cheapest price
    * for the largest size (min price, max size dominance) through the
    * two-stage distributed skyline ([[graft.operators.Skyline]]) —
    * the salted local pass prunes map-side, only local frontiers
    * reach the serial global pass. The oracle states the quadratic
    * NOT-EXISTS definition, pinning the sorted-window reformulation's
    * equivalence.
    */
  def qSkyline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.operators.Skyline.pareto(
        Tables(spark, dir).part.select($"p_retailprice".as("price"), $"p_size".as("sz")),
        "price", "sz")
      .orderBy($"price")
  }

  private val qSkylineSql =
    """WITH pts AS (
      |  SELECT p_retailprice AS price, p_size AS sz, count(*) AS n_rows
      |  FROM part GROUP BY 1, 2)
      |SELECT price, sz, n_rows FROM pts r
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM pts s
      |  WHERE s.price <= r.price AND s.sz >= r.sz
      |    AND (s.price < r.price OR s.sz > r.sz))
      |ORDER BY price""".stripMargin

  /** Exponentially weighted moving average per user over the purchase
    * stream (α = 0.25, s₀ = first value) — the smoothing primitive
    * behind anomaly baselines and feature pipelines. EWMA is a
    * sequential recurrence, so it runs as ONE per-key fold: values
    * collect in arrival order (event_id — the stream's sequence
    * number, deterministic on any engine) and a codegen'd `aggregate`
    * lambda folds them left-to-right; both engines fold in identical
    * order, so the doubles agree exactly (the q_array_ops parity).
    * Scale: per-key state is that key's own event list — the same
    * bounded-per-entity contract as sessionization; the groupBy is
    * the only shuffle.
    */
  def tsEwma(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).events
      .filter($"event_type" === "purchase")
      .groupBy($"user_id")
      .agg(sort_array(collect_list(struct($"event_id", $"value"))).as("seq"))
      .withColumn("vals", expr("transform(seq, x -> x.value)"))
      .select($"user_id", size($"vals").cast("long").as("n_events"),
        round(expr(
          "aggregate(slice(vals, 2, size(vals) - 1), element_at(vals, 1)," +
            " (acc, x) -> acc * 0.75 + 0.25 * x)"), 4).as("ewma"))
      .orderBy($"user_id")
  }

  private val tsEwmaSql =
    """SELECT user_id, count(*) AS n_events,
      |  round(list_reduce(list(value ORDER BY event_id),
      |    (acc, x) -> acc * 0.75 + 0.25 * x), 4) AS ewma
      |FROM events WHERE event_type = 'purchase'
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Order-independent content digests of two tables
    * ([[graft.etl.TableDigest]]): rows hash scan-side (floats enter
    * as integer cents, timestamps as epoch micros — raw float/ts
    * string formatting is not defined cross-engine), the table digest
    * is the map-side-combinable XOR of row hashes, and comparing two
    * tables moves one row each. The hash-match against DuckDB is the
    * point: the digest only works as an integrity check if two
    * INDEPENDENT engines derive the same value from the same rows.
    */
  def etlTableDigest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val cust = graft.etl.TableDigest.digest(t.customer, "customer", Seq(
      $"c_custkey", $"c_name", $"c_nationkey",
      round($"c_acctbal" * 100).cast("long"), $"c_mktsegment"))
    val ord = graft.etl.TableDigest.digest(t.orders, "orders", Seq(
      $"o_orderkey", $"o_custkey", $"o_orderstatus",
      round($"o_totalprice" * 100).cast("long"),
      // o_orderdate is TIMESTAMP_NTZ; the session is pinned UTC, so
      // the cast to TIMESTAMP is epoch-identical to DuckDB's epoch_us
      expr("unix_micros(cast(o_orderdate as timestamp))"), $"o_orderpriority"))
    cust.unionByName(ord).orderBy($"table_name")
  }

  private val etlTableDigestSql =
    """WITH c AS (
      |  SELECT CAST(('0x' || substr(md5(
      |    CAST(c_custkey AS VARCHAR) || '|' || c_name || '|' ||
      |    CAST(c_nationkey AS VARCHAR) || '|' ||
      |    CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS VARCHAR) || '|' ||
      |    c_mktsegment), 1, 15)) AS UBIGINT) AS rh
      |  FROM customer),
      |o AS (
      |  SELECT CAST(('0x' || substr(md5(
      |    CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR) || '|' ||
      |    o_orderstatus || '|' ||
      |    CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR) || '|' ||
      |    CAST(epoch_us(o_orderdate) AS VARCHAR) || '|' ||
      |    o_orderpriority), 1, 15)) AS UBIGINT) AS rh
      |  FROM orders)
      |SELECT 'customer' AS table_name, count(*) AS n_rows,
      |  CAST(bit_xor(rh) AS BIGINT) AS xor_digest FROM c
      |UNION ALL
      |SELECT 'orders', count(*), CAST(bit_xor(rh) AS BIGINT) FROM o
      |ORDER BY table_name""".stripMargin

  /** Rolling distinct users — DAU plus 7-day WAU per day (the
    * engagement metric every analytics stack ships). Distinct
    * counting doesn't run inside a window frame, so the rolling
    * distinct is restated as an equi-join: the distinct (user, day)
    * set fans out to the 7 window-end days it belongs to (a bounded
    * ×7 map-side explode — never a range join), then one distinct
    * aggregate per end day. Two shuffles total, both map-side
    * combinable; the fan-out factor IS the window length, which is
    * how this stays linear at 100 TB.
    */
  def qRollingDau(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, dir).events
    val userDays = e.select($"user_id",
      expr("unix_micros(ts) div 86400000000").as("day")).distinct()
    val dau = userDays.groupBy($"day").agg(count(lit(1)).as("dau"))
    val wau = userDays
      .select($"user_id", explode(sequence($"day", $"day" + 6)).as("day"))
      .groupBy($"day").agg(countDistinct($"user_id").as("wau_7d"))
    // report only days that exist in the stream (the fan-out creates
    // up to 6 phantom trailing days)
    dau.join(wau, Seq("day"))
      .select($"day", $"dau", $"wau_7d")
      .orderBy($"day")
  }

  private val qRollingDauSql =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
      |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
      |wau AS (SELECT day + i AS day, count(DISTINCT user_id) AS wau_7d
      |        FROM ud, range(0, 7) t(i) GROUP BY day + i)
      |SELECT day, dau, wau_7d FROM dau JOIN wau USING (day)
      |ORDER BY day""".stripMargin

  /** Median absolute deviation per group — the robust scale estimator
    * next to [[qOutlierIqr]]'s fences (MAD tolerates 50% outliers;
    * stddev breaks at one). Two exact-percentile aggregates: the
    * per-type median, then the median of |x − median| after one
    * hint-free join back (the same shuffle key both times). Exact
    * percentile parity is pinned by `q_percentiles`.
    */
  def qMadStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, dir).events
    val med = e.groupBy($"event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    e.join(med, "event_type")
      .groupBy($"event_type")
      .agg(round(first($"med"), 4).as("median"),
        round(expr("percentile(abs(value - med), 0.5)"), 4).as("mad"),
        count(lit(1)).as("n"))
      .orderBy($"event_type")
  }

  private val qMadStatsSql =
    """WITH m AS (
      |  SELECT event_type, quantile_cont(value, 0.5) AS med
      |  FROM events GROUP BY event_type)
      |SELECT e.event_type, round(any_value(m.med), 4) AS median,
      |  round(quantile_cont(abs(e.value - m.med), 0.5), 4) AS mad,
      |  count(*) AS n
      |FROM events e JOIN m USING (event_type)
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin

  /** Linear interpolation across time-series gaps — the sibling of
    * [[qGapFill]]'s LOCF for signals where holding the last value
    * misstates a trend: each missing hourly bucket takes the value
    * interpolated between its nearest observed neighbors. Same
    * per-key grid (bounded by that key's own span), with TWO
    * conditional LOCF windows (previous observed value/hour looking
    * back, next observed looking forward) sharing the single user_id
    * shuffle. The lerp arithmetic is stated identically on both
    * engines over already-rounded observations and integer hours.
    */
  def tsInterpolate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, dir).events
      .filter($"user_id" < 10 && $"event_type" === "purchase")
    val b = e.groupBy($"user_id",
        expr("unix_micros(ts) div 3600000000").as("h"))
      .agg(round(sum($"value"), 4).as("v_obs"))
    val grid = b.groupBy($"user_id").agg(min($"h").as("h0"), max($"h").as("h1"))
      .select($"user_id", explode(sequence($"h0", $"h1")).as("h"))
    val wb = Window.partitionBy($"user_id").orderBy($"h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy($"user_id").orderBy($"h")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    grid.join(b, Seq("user_id", "h"), "left")
      .select($"user_id", $"h", $"v_obs",
        last($"v_obs", ignoreNulls = true).over(wb).as("pv"),
        last(when($"v_obs".isNotNull, $"h"), ignoreNulls = true).over(wb).as("ph"),
        first($"v_obs", ignoreNulls = true).over(wf).as("nv"),
        first(when($"v_obs".isNotNull, $"h"), ignoreNulls = true).over(wf).as("nh"))
      // lerp in integer ten-thousandths: the observations are 4-decimal,
      // so pvi/nvi are exact longs, the lerp is integer until ONE
      // division, and floor(x + 0.5) replaces round() — a lerp between
      // 4-decimal endpoints lands EXACTLY on .00005 half-way points,
      // where Spark's BigDecimal rounding and DuckDB's multiply-rint
      // disagree (the r5 half-way-mean lesson)
      .withColumn("pvi", round($"pv" * 10000).cast("long"))
      .withColumn("nvi", round($"nv" * 10000).cast("long"))
      .select($"user_id", $"h".as("hour_bucket"), $"v_obs".isNull.as("is_gap"),
        when($"v_obs".isNotNull, $"v_obs")
          .otherwise(
            floor($"pvi" + ($"nvi" - $"pvi") * ($"h" - $"ph") / ($"nh" - $"ph") + 0.5)
              / 10000.0)
          .as("v_interp"))
      .orderBy($"user_id", $"hour_bucket")
  }

  private val tsInterpolateSql =
    """WITH b AS (
      |  SELECT user_id, epoch_us(ts) // 3600000000 AS h,
      |    round(sum(value), 4) AS v_obs
      |  FROM events WHERE user_id < 10 AND event_type = 'purchase'
      |  GROUP BY 1, 2),
      |g AS (SELECT user_id, unnest(range(min(h), max(h) + 1)) AS h
      |      FROM b GROUP BY user_id),
      |j AS (
      |  SELECT g.user_id, g.h, b.v_obs,
      |    last_value(b.v_obs IGNORE NULLS) OVER (
      |      PARTITION BY g.user_id ORDER BY g.h
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
      |    last_value(CASE WHEN b.v_obs IS NOT NULL THEN g.h END IGNORE NULLS) OVER (
      |      PARTITION BY g.user_id ORDER BY g.h
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
      |    first_value(b.v_obs IGNORE NULLS) OVER (
      |      PARTITION BY g.user_id ORDER BY g.h
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
      |    first_value(CASE WHEN b.v_obs IS NOT NULL THEN g.h END IGNORE NULLS) OVER (
      |      PARTITION BY g.user_id ORDER BY g.h
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
      |  FROM g LEFT JOIN b ON b.user_id = g.user_id AND b.h = g.h),
      |q AS (
      |  SELECT user_id, h, v_obs, ph, nh,
      |    CAST(round(pv * 10000) AS BIGINT) AS pvi,
      |    CAST(round(nv * 10000) AS BIGINT) AS nvi
      |  FROM j)
      |SELECT user_id, h AS hour_bucket, v_obs IS NULL AS is_gap,
      |  CASE WHEN v_obs IS NOT NULL THEN v_obs
      |    ELSE floor(pvi + (nvi - pvi) * (h - ph) / (nh - ph) + 0.5) / 10000.0
      |  END AS v_interp
      |FROM q ORDER BY user_id, hour_bucket""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("ts_interpolate", tsInterpolate _, tsInterpolateSql),
    QueryDef.sql("etl_profile", etlProfile _, etlProfileSql),
    QueryDef.sql("q_outlier_iqr", qOutlierIqr _, qOutlierIqrSql),
    QueryDef.sql("q_gap_fill", qGapFill _, qGapFillSql),
    QueryDef.sql("q_skyline", qSkyline _, qSkylineSql),
    QueryDef.sql("ts_ewma", tsEwma _, tsEwmaSql),
    QueryDef.sql("etl_table_digest", etlTableDigest _, etlTableDigestSql),
    QueryDef.sql("q_rolling_dau", qRollingDau _, qRollingDauSql),
    QueryDef.sql("q_mad_stats", qMadStats _, qMadStatsSql))
}
