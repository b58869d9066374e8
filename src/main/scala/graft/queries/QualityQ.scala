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

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("etl_profile", etlProfile _, etlProfileSql),
    QueryDef.sql("q_outlier_iqr", qOutlierIqr _, qOutlierIqrSql),
    QueryDef.sql("q_gap_fill", qGapFill _, qGapFillSql),
    QueryDef.sql("q_skyline", qSkyline _, qSkylineSql))
}
