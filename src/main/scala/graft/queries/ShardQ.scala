package graft.queries

import graft.Tables
import graft.etl.TableDigest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 sharding/integrity wave: rendezvous (highest-random-weight)
  * shard assignment with its minimal-reshuffle guarantee measured
  * in-plan, partition-level content digests (the incremental-sync
  * face of `etl_table_digest`), and the partial-autocorrelation
  * function by the Durbin–Levinson recursion (the AR-order
  * diagnostic next to `ts_acf`).
  */
object ShardQ {

  // ----------------------------------------------------- etl_rendezvous_shard

  /** Rendezvous/HRW sharding: every doc goes to the shard whose
    * md5(doc, shard) weight is highest — no coordination, no ring
    * state, and growing 4 → 5 shards moves ONLY the docs the new
    * shard now wins (≈1/5, measured in the same plan as the
    * assignment). The per-doc work is a 5-way explode + one argmax —
    * map-side only, no shuffle at all before the summary aggregate.
    * The sharding operator an incremental 100 TB pipeline uses to
    * keep reshuffles proportional to capacity changes.
    */
  def etlRendezvousShard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val assigned = Tables(spark, dir).documents
      .select($"doc_id", explode(sequence(lit(0L), lit(4L))).as("s"))
      .withColumn("h",
        conv(substring(md5(concat($"doc_id".cast("string"), lit(":"),
          $"s".cast("string"))), 1, 15), 16, 10).cast("long"))
      .groupBy($"doc_id")
      .agg(max_by($"s", $"h").as("a5"),
        max_by(when($"s" < 4, $"s"), when($"s" < 4, $"h")).as("a4"))
    assigned
      .groupBy($"a5".as("shard"))
      .agg(count(lit(1)).as("n_at_5"),
        sum(when($"a4" === $"a5", 0L).otherwise(1L)).as("arrived"),
        sum(when($"a4" === $"a5", 1L).otherwise(0L)).as("stayed"))
      .withColumn("n_moved_total", sum($"arrived").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("n_docs", sum($"n_at_5").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select($"shard", $"n_at_5", $"stayed", $"arrived",
        round($"n_moved_total".cast("double") / $"n_docs", 4).as("moved_share"))
      .orderBy($"shard")
  }

  private val etlRendezvousShardSql =
    """WITH e AS (
      |  SELECT doc_id, s,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(s AS VARCHAR)), 1, 15))
      |      AS BIGINT) AS h
      |  FROM documents, range(0, 5) t(s)),
      |asg AS (
      |  SELECT doc_id, arg_max(s, h) AS a5,
      |    arg_max(CASE WHEN s < 4 THEN s END, CASE WHEN s < 4 THEN h END) AS a4
      |  FROM e GROUP BY doc_id),
      |per AS (
      |  SELECT a5 AS shard, count(*) AS n_at_5,
      |    CAST(sum(CASE WHEN a4 = a5 THEN 1 ELSE 0 END) AS BIGINT) AS stayed,
      |    CAST(sum(CASE WHEN a4 = a5 THEN 0 ELSE 1 END) AS BIGINT) AS arrived
      |  FROM asg GROUP BY a5)
      |SELECT shard, n_at_5, stayed, arrived,
      |  round(CAST(sum(arrived) OVER () AS DOUBLE) / sum(n_at_5) OVER (), 4) AS moved_share
      |FROM per ORDER BY shard""".stripMargin

  // ----------------------------------------------------- etl_partition_digest

  /** Partition-level content digests: `etl_table_digest`'s XOR fold
    * grouped by a month bucket — the table an incremental replicator
    * diffs to ship ONLY changed partitions (digest mismatch = resync
    * that month; n_rows catches pure inserts). Still map-side
    * combinable, still order/layout-blind within each partition;
    * comparing two lakes moves months × 3 longs.
    */
  def etlPartitionDigest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).orders
      .select(expr("unix_micros(cast(o_orderdate as timestamp)) div 2592000000000")
          .as("month_bucket"),
        TableDigest.rowHash(Seq($"o_orderkey", $"o_custkey", $"o_orderstatus",
          round($"o_totalprice" * 100).cast("long"),
          unix_micros($"o_orderdate".cast("timestamp")),
          $"o_orderpriority")).as("rh"))
      .groupBy($"month_bucket")
      .agg(count(lit(1)).as("n_rows"),
        coalesce(expr("bit_xor(rh)"), lit(0L)).as("xor_digest"))
      .orderBy($"month_bucket")
  }

  private val etlPartitionDigestSql =
    """WITH r AS (
      |  SELECT epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 2592000000000 AS month_bucket,
      |    CAST(('0x' || substr(md5(
      |      CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR) || '|' ||
      |      o_orderstatus || '|' ||
      |      CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR) || '|' ||
      |      CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS VARCHAR) || '|' ||
      |      o_orderpriority), 1, 15)) AS UBIGINT) AS rh
      |  FROM orders)
      |SELECT month_bucket, count(*) AS n_rows,
      |  coalesce(CAST(bit_xor(rh) AS BIGINT), 0) AS xor_digest
      |FROM r GROUP BY month_bucket ORDER BY month_bucket""".stripMargin

  // ---------------------------------------------------------------- ts_pacf

  /** Partial autocorrelation (lags 1–7) by the Durbin–Levinson
    * recursion — the AR-order diagnostic that separates direct from
    * inherited correlation, companion to `ts_acf`. The ACF inputs
    * reduce distributedly (the lag join over the day-cardinality
    * aggregated series, rounded to 6 so both engines seed identical
    * doubles); the recursion itself is 7 steps over ≤7-element
    * arrays — pure metadata — folded in ONE aggregate() HOF with
    * ascending-index sums, replayed by the oracle as a recursive CTE
    * whose list_reduce folds in the same order. IEEE-deterministic
    * end to end.
    */
  def tsPacf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables(spark, dir).events
      .filter($"event_type" === "purchase")
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(round($"value" * 100).cast("long")).as("cents"))
    val lags = spark.range(1, 8).select($"id".as("lag"))
    val rhos = daily.as("a")
      .crossJoin(broadcast(lags))
      .join(broadcast(daily.as("b")), expr("b.day = a.day - lag"))
      .groupBy($"lag")
      .agg(round(corr($"a.cents", $"b.cents"), 6).as("acf"))
      .agg(array_sort(collect_list(struct($"lag", $"acf"))).as("ra"))
      .select(expr("transform(ra, x -> x.acf)").as("r"))
    // Durbin–Levinson: acc = (k, phi[1..k], out); the step coefficient
    // a_{k+1} appears in three fields, so the expression repeats (the
    // ts_holt HOF discipline — no let-binding in SQL lambdas)
    val step =
      """(x - aggregate(zip_with(acc.phi, reverse(slice(r, 1, acc.k)), (p, rr) -> p * rr),
        |              0.0D, (s, t) -> s + t))
        |/ (1.0D - aggregate(zip_with(acc.phi, slice(r, 1, acc.k), (p, rr) -> p * rr),
        |              0.0D, (s, t) -> s + t))""".stripMargin
    rhos.select(explode(expr(
      s"""aggregate(slice(r, 2, 6),
         |  named_struct('k', 1, 'phi', array(r[0]),
         |    'out', array(named_struct('lag', 1, 'pacf', round(r[0], 4)))),
         |  (acc, x) -> named_struct(
         |    'k', acc.k + 1,
         |    'phi', concat(transform(sequence(1, acc.k),
         |             j -> element_at(acc.phi, j) - ($step) * element_at(acc.phi, acc.k + 1 - j)),
         |           array($step)),
         |    'out', array_append(acc.out,
         |             named_struct('lag', acc.k + 1, 'pacf', round($step, 4)))),
         |  acc -> acc.out)""".stripMargin)))
      .select($"col.lag".as("lag"), $"col.pacf".as("pacf"))
      .orderBy($"lag")
  }

  private val tsPacfSql = {
    val sumA = "list_reduce([phi[j] * r[k + 1 - j] for j in range(1, k + 1)], (x, y) -> x + y)"
    val sumB = "list_reduce([phi[j] * r[j] for j in range(1, k + 1)], (x, y) -> x + y)"
    s"""WITH RECURSIVE daily AS (
       |  SELECT epoch_us(ts) // 86400000000 AS day,
       |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
       |rhos AS (
       |  SELECT lag, round(corr(a.cents, b.cents), 6) AS acf
       |  FROM daily a CROSS JOIN (SELECT range AS lag FROM range(1, 8)) l
       |  JOIN daily b ON b.day = a.day - lag
       |  GROUP BY lag),
       |rl AS (SELECT list(acf ORDER BY lag) AS r FROM rhos),
       |rec(k, phi, out) AS (
       |  SELECT 1, [r[1]], [{'lag': 1, 'pacf': round(r[1], 4)}] FROM rl
       |  UNION ALL
       |  SELECT k + 1,
       |    [phi[j] - a * phi[k + 1 - j] for j in range(1, k + 1)] || [a],
       |    out || [{'lag': k + 1, 'pacf': round(a, 4)}]
       |  FROM (
       |    SELECT k, phi, out, r,
       |      (r[k + 1] - $sumA) / (1.0 - $sumB) AS a
       |    FROM rec, rl WHERE k < 7) t)
       |SELECT u.lag AS lag, u.pacf AS pacf
       |FROM (SELECT unnest(out, recursive := true) FROM rec WHERE k = 7) u(lag, pacf)
       |ORDER BY lag""".stripMargin
  }

  // ---------------------------------------------------------------- registry

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("etl_rendezvous_shard", etlRendezvousShard _, etlRendezvousShardSql),
    QueryDef.sql("etl_partition_digest", etlPartitionDigest _, etlPartitionDigestSql),
    QueryDef.sql("ts_pacf", tsPacf _, tsPacfSql))
}
