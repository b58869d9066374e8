package graft.queries

import graft.Tables
import graft.sources.SniffCsv
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 robustness wave: PERMISSIVE quarantine intake (the
  * at-scale complement of the reference's FAILFAST), a walk-forward
  * forecast backtest scoring `ts_holt` against the naive baseline,
  * and the NOT IN null-semantics trap surfaced as a first-class
  * query (the null-aware anti-join).
  */
object RobustQ {

  // ----------------------------------------------------------- etl_quarantine

  /** Quarantine intake: a staged nation CSV with two token-surplus
    * lines injected reads under [[SniffCsv.readQuarantine]] —
    * PERMISSIVE + corrupt-record sink. Clean rows flow, malformed
    * rows land in quarantine WITH their raw line; the gate emits the
    * accounting row every 100 TB intake publishes instead of
    * aborting (the reference's FAILFAST stance stays available as
    * `etl_csv_roundtrip`/`Pipeline.ingest`). The staged content is
    * derived from the lake, so the oracle recomputes expected counts
    * from `nation` and the injected literals.
    */
  def etlQuarantine(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tmp = s"/tmp/graft_quarantine/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
    val n = Tables(spark, dir).nation
      .select($"n_nationkey".cast("string"), $"n_name", $"n_regionkey".cast("string"))
      .collect() // 25 rows: bounded dimension, not fact data
      .map(r => s"${r.getString(0)},${r.getString(1)},${r.getString(2)}")
    val content = ("n_nationkey,n_name,n_regionkey" +: n.toSeq) ++
      Seq("98,RAGGEDLAND,9,EXTRA,TOKENS", "99,OVERFLOWIA,9,SPILL")
    val f = new java.io.File(tmp); f.mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$tmp/nation.csv"),
      content.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // Spark refuses aggregates whose referenced columns are ONLY the
    // corrupt sink (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache the
    // parsed result first, exactly as the error message prescribes
    val q = SniffCsv.readQuarantine(spark, s"$tmp/nation.csv").cache()
    q.agg(count(lit(1)).as("n_rows"),
        sum(when($"_corrupt".isNull, 1L).otherwise(0L)).as("n_clean"),
        sum(when($"_corrupt".isNotNull, 1L).otherwise(0L)).as("n_quarantined"),
        max($"_corrupt").as("sample_corrupt"))
      .select($"n_rows", $"n_clean", $"n_quarantined", $"sample_corrupt")
  }

  private val etlQuarantineSql =
    """SELECT count(*) + 2 AS n_rows,
      |  count(*) AS n_clean,
      |  CAST(2 AS BIGINT) AS n_quarantined,
      |  '99,OVERFLOWIA,9,SPILL' AS sample_corrupt
      |FROM nation""".stripMargin

  // ------------------------------------------------------------- ts_backtest

  /** Walk-forward backtest of the Holt smoother: each day's forecast
    * (made from data strictly before it) scores against the next
    * observed day, with the naive carry-forward as the baseline every
    * forecast must beat. The error accounting runs in EXACT 1e-4
    * units (forecasts are already 4-rounded, actuals are integer
    * cents), so MAEs are ratios of exact longs. One lead() window
    * over the day-cardinality series on top of `ts_holt`'s bounded
    * fold.
    */
  def tsBacktest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val h = MineQ.tsHolt(spark, dir)
      .withColumn("next_cents", lead($"cents", 1).over(Window.orderBy($"day")))
      .filter($"next_cents".isNotNull)
      .select(
        (round($"forecast_next" * 1e4).cast("long") - $"next_cents" * 100).as("e_holt"),
        ($"cents" * 100 - $"next_cents" * 100).as("e_naive"))
    h.agg(count(lit(1)).as("n_forecasts"),
        sum(abs($"e_holt")).as("abs_err_holt_e4"),
        sum(abs($"e_naive")).as("abs_err_naive_e4"))
      .select($"n_forecasts",
        round($"abs_err_holt_e4".cast("double") / $"n_forecasts" / 1e4, 2).as("mae_holt"),
        round($"abs_err_naive_e4".cast("double") / $"n_forecasts" / 1e4, 2).as("mae_naive"),
        ($"abs_err_holt_e4" < $"abs_err_naive_e4").as("holt_beats_naive"))
  }

  private val tsBacktestSql =
    s"""WITH RECURSIVE ${MineQ.holtCoreSql},
      |f AS (
      |  SELECT round((l + b) / 100, 4) AS forecast_next, cents,
      |    lead(cents) OVER (ORDER BY day) AS next_cents
      |  FROM rec),
      |e AS (
      |  SELECT CAST(round(forecast_next * 1e4) AS BIGINT) - next_cents * 100 AS e_holt,
      |    cents * 100 - next_cents * 100 AS e_naive
      |  FROM f WHERE next_cents IS NOT NULL)
      |SELECT count(*) AS n_forecasts,
      |  round(CAST(sum(abs(e_holt)) AS DOUBLE) / count(*) / 1e4, 2) AS mae_holt,
      |  round(CAST(sum(abs(e_naive)) AS DOUBLE) / count(*) / 1e4, 2) AS mae_naive,
      |  CAST(sum(abs(e_holt)) AS BIGINT) < CAST(sum(abs(e_naive)) AS BIGINT)
      |    AS holt_beats_naive
      |FROM e""".stripMargin

  // ---------------------------------------------------------- q_not_in_nulls

  /** The NOT IN null trap as a first-class query, through the SQL
    * face: one NULL in the subquery makes `x NOT IN (...)` UNKNOWN
    * for every row (three-valued logic — Spark plans a null-aware
    * anti join), while NOT EXISTS ignores the NULL. The gate emits
    * both counts side by side — the pair every migration off a
    * legacy engine has to reconcile. Both engines implement the SQL
    * standard, so the oracle is the identical query.
    */
  def qNotInNulls(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer.createOrReplaceTempView("customer")
    t.orders.createOrReplaceTempView("orders")
    spark.sql(qNotInNullsSql)
  }

  private val qNotInNullsSql =
    """WITH probe AS (
      |  SELECT CASE WHEN c_custkey % 100 = 0 THEN NULL ELSE c_custkey END AS k
      |  FROM customer WHERE c_custkey <= 500)
      |SELECT
      |  (SELECT count(*) FROM orders WHERE o_custkey NOT IN (SELECT k FROM probe))
      |    AS n_not_in,
      |  (SELECT count(*) FROM orders
      |     WHERE o_custkey NOT IN (SELECT k FROM probe WHERE k IS NOT NULL))
      |    AS n_not_in_nullfree,
      |  (SELECT count(*) FROM orders o
      |     WHERE NOT EXISTS (SELECT 1 FROM probe p WHERE p.k = o.o_custkey))
      |    AS n_not_exists""".stripMargin

  // ---------------------------------------------------------------- registry

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("etl_quarantine", etlQuarantine _, etlQuarantineSql),
    QueryDef.sql("ts_backtest", tsBacktest _, tsBacktestSql),
    QueryDef.sql("q_not_in_nulls", qNotInNulls _, qNotInNullsSql))
}
