package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 wave 2 — lake-audit operators: a referential-integrity
  * sweep over every FK edge of the star schema, and the compaction
  * planner that bin-packs file-level stats into target-sized output
  * shards. Both are the "run it over the whole lake" maintenance
  * shapes a 100 TB deployment schedules nightly.
  */
object AuditQ {

  /** One FK edge: child table/column → parent table/column. */
  private case class Fk(name: String, child: String, ck: String,
      parent: String, pk: String)

  private val Edges = Seq(
    Fk("lineitem.l_orderkey->orders.o_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    Fk("lineitem.l_partkey->part.p_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    Fk("lineitem.l_suppkey->supplier.s_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    Fk("orders.o_custkey->customer.c_custkey", "orders", "o_custkey", "customer", "c_custkey"),
    Fk("customer.c_nationkey->nation.n_nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
    Fk("supplier.s_nationkey->nation.n_nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"),
    Fk("nation.n_regionkey->region.r_regionkey", "nation", "n_regionkey", "region", "r_regionkey"))

  /** Referential-integrity audit: for every FK edge of the schema,
    * the child row count, orphan count (child keys with no parent)
    * and null-key count, as one summary table. Each edge is a LEFT
    * join of the child's key column against the DISTINCT parent keys
    * + one map-side-combinable aggregate; no broadcast hints (parent
    * dimensions are usually small — AQE broadcasts them when
    * measured small, the tfidf rule). The whole audit reads each
    * child table once and only its key columns — at 100 TB the scan
    * is column-pruned to one integer column per edge.
    */
  def etlFkIntegrity(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val per = Edges.map { e =>
      val parentKeys = t.byName(e.parent).select(col(e.pk).as("__pk"))
        .distinct().withColumn("__hit", lit(1))
      t.byName(e.child).select(col(e.ck).as("__ck"))
        .join(parentKeys, col("__ck") === col("__pk"), "left")
        .agg(
          count(lit(1)).as("n_child"),
          sum(when(col("__ck").isNull, 1L).otherwise(0L)).as("n_null_key"),
          sum(when(col("__ck").isNotNull && col("__hit").isNull, 1L)
            .otherwise(0L)).as("n_orphans"))
        .select(lit(e.name).as("fk"), col("n_child"), col("n_null_key"),
          col("n_orphans"),
          round(col("n_orphans") / col("n_child"), 6).as("orphan_rate"))
    }
    per.reduce(_.unionByName(_)).orderBy(col("fk"))
  }

  private val etlFkIntegritySql = Edges.map { e =>
    s"""SELECT '${e.name}' AS fk, count(*) AS n_child,
       |  CAST(sum(CASE WHEN c.${e.ck} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_key,
       |  CAST(sum(CASE WHEN c.${e.ck} IS NOT NULL AND p.__pk IS NULL
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
       |  round(sum(CASE WHEN c.${e.ck} IS NOT NULL AND p.__pk IS NULL
       |    THEN 1 ELSE 0 END) / count(*), 6) AS orphan_rate
       |FROM ${e.child} c LEFT JOIN
       |  (SELECT DISTINCT ${e.pk} AS __pk FROM ${e.parent}) p
       |  ON c.${e.ck} = p.__pk""".stripMargin
  }.mkString("", "\nUNION ALL\n", "\nORDER BY fk")

  /** Compaction planner: bin-pack per-(source, lang) file stats into
    * output shards of ~64 KB of text via a running-total first-fit
    * (`shard = floor(preceding_bytes / target)`). The window is
    * GLOBAL but runs over file-level METADATA — the stats table is
    * smaller than the data by the mean file size (a million files of
    * 128 MB for 100 TB), which is the standard compaction-planner
    * shape: plan serially over stats, execute the rewrite in
    * parallel per shard. Integer arithmetic end to end.
    */
  def etlBinpack(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stats = Tables(spark, dir).documents
      .groupBy($"source", $"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("bytes_est"))
    val w = Window.orderBy($"source", $"lang")
      .rowsBetween(Window.unboundedPreceding, -1)
    stats
      .withColumn("prev_bytes", coalesce(sum($"bytes_est").over(w), lit(0L)))
      // integer `div` (not Column `/` + cast): long end to end, the
      // Triangles wedge-math rule
      .withColumn("shard", expr("prev_bytes div 65536"))
      .select($"source", $"lang", $"n_docs", $"bytes_est", $"shard")
      .orderBy($"source", $"lang")
  }

  private val etlBinpackSql =
    """WITH stats AS (
      |  SELECT source, lang, count(*) AS n_docs,
      |    CAST(sum(n_chars) AS BIGINT) AS bytes_est
      |  FROM documents GROUP BY source, lang)
      |SELECT source, lang, n_docs, bytes_est,
      |  CAST(coalesce(CAST(sum(bytes_est) OVER (
      |    ORDER BY source, lang
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
      |    // 65536 AS BIGINT) AS shard
      |FROM stats ORDER BY source, lang""".stripMargin

  /** Join-key skew profile — the diagnostic a 100 TB join plan is
    * sized from: per-key frequencies of a fact join column, the
    * top-10 heaviest keys with their corpus share, and the global
    * skew factor (max/mean — AQE's skew-join trigger is this number
    * per partition). One map-side-combinable count aggregate to
    * key-cardinality, TakeOrderedAndProject heaps for the top-10
    * (never a global sort), scalar stats broadcast back. Shares and
    * skew divide exact integers — identical doubles both engines.
    */
  def qSkewProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cnt = Tables(spark, dir).lineitem
      .groupBy($"l_partkey").agg(count(lit(1)).as("cnt"))
    val stats = cnt.agg(count(lit(1)).as("n_keys"), sum($"cnt").as("total"),
      max($"cnt").as("max_cnt"))
    cnt.crossJoin(broadcast(stats))
      .select($"l_partkey".as("key"), $"cnt",
        round($"cnt" / $"total", 6).as("share"),
        round($"max_cnt" * $"n_keys" / $"total", 4).as("skew_factor"))
      .orderBy($"cnt".desc, $"key").limit(10)
  }

  private val qSkewProfileSql =
    """WITH cnt AS (
      |  SELECT l_partkey AS key, count(*) AS cnt FROM lineitem GROUP BY 1),
      |stats AS (
      |  SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS total,
      |    max(cnt) AS max_cnt FROM cnt)
      |SELECT key, cnt, round(cnt / total, 6) AS share,
      |  round(max_cnt * n_keys / total, 4) AS skew_factor
      |FROM cnt, stats ORDER BY cnt DESC, key LIMIT 10""".stripMargin

  /** Functional-dependency discovery: does determinant column A fix
    * dependent column B? `A → B` holds iff |distinct A| = |distinct
    * (A,B)| — the constraint-mining audit that surfaces undocumented
    * keys before a dedup or upsert keys on the wrong column. One
    * multi-distinct aggregate per table (Catalyst plans the Expand +
    * partial-distinct shape — fully map-side-combinable), candidate
    * rows stacked by an explode over the single result row.
    */
  def etlFdDiscovery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    def fd(tbl: String, det: String, dep: String,
           d: Column, p: Column): Column =
      struct(lit(tbl).as("tbl"), lit(det).as("det"), lit(dep).as("dep"),
        d.as("n_det"), p.as("n_pair"))
    val o = t.orders.agg(
      countDistinct($"o_orderkey").as("d1"),
      countDistinct($"o_orderkey", $"o_custkey").as("p1"),
      countDistinct($"o_custkey").as("d2"),
      countDistinct($"o_custkey", $"o_orderpriority").as("p2"),
      countDistinct($"o_orderstatus").as("d3"),
      countDistinct($"o_orderstatus", $"o_orderpriority").as("p3"))
      .select(explode(array(
        fd("orders", "o_orderkey", "o_custkey", $"d1", $"p1"),
        fd("orders", "o_custkey", "o_orderpriority", $"d2", $"p2"),
        fd("orders", "o_orderstatus", "o_orderpriority", $"d3", $"p3")))
        .as("fd"))
    val n = t.nation.agg(
      countDistinct($"n_nationkey").as("d1"),
      countDistinct($"n_nationkey", $"n_regionkey").as("p1"))
      .select(explode(array(
        fd("nation", "n_nationkey", "n_regionkey", $"d1", $"p1"))).as("fd"))
    o.union(n).select($"fd.*")
      .withColumn("holds", $"n_det" === $"n_pair")
      .orderBy($"tbl", $"det", $"dep")
  }

  private val etlFdDiscoverySql =
    """SELECT * FROM (
      |  SELECT 'orders' AS tbl, 'o_orderkey' AS det, 'o_custkey' AS dep,
      |    count(DISTINCT o_orderkey) AS n_det,
      |    count(DISTINCT (o_orderkey, o_custkey)) AS n_pair,
      |    count(DISTINCT o_orderkey) = count(DISTINCT (o_orderkey, o_custkey)) AS holds
      |  FROM orders
      |  UNION ALL
      |  SELECT 'orders', 'o_custkey', 'o_orderpriority',
      |    count(DISTINCT o_custkey),
      |    count(DISTINCT (o_custkey, o_orderpriority)),
      |    count(DISTINCT o_custkey) = count(DISTINCT (o_custkey, o_orderpriority))
      |  FROM orders
      |  UNION ALL
      |  SELECT 'orders', 'o_orderstatus', 'o_orderpriority',
      |    count(DISTINCT o_orderstatus),
      |    count(DISTINCT (o_orderstatus, o_orderpriority)),
      |    count(DISTINCT o_orderstatus) = count(DISTINCT (o_orderstatus, o_orderpriority))
      |  FROM orders
      |  UNION ALL
      |  SELECT 'nation', 'n_nationkey', 'n_regionkey',
      |    count(DISTINCT n_nationkey),
      |    count(DISTINCT (n_nationkey, n_regionkey)),
      |    count(DISTINCT n_nationkey) = count(DISTINCT (n_nationkey, n_regionkey))
      |  FROM nation)
      |ORDER BY tbl, det, dep""".stripMargin

  /** Encoding-health audit per source: docs containing non-ASCII
    * codepoints, stray control characters (excluding \t \n \r) and
    * U+FFFD replacement chars — the mojibake tripwire run before any
    * tokenizer sees the corpus. Three codegen'd rlike counts in ONE
    * scan-shaped aggregate; the char classes behave identically
    * under Java regex and RE2 (both codepoint-based). Rates divide
    * exact integers, unrounded.
    */
  def etlEncodingAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"text".rlike("[^\\x00-\\x7F]"), 1L).otherwise(0L))
          .as("n_non_ascii"),
        sum(when($"text".rlike("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"), 1L)
          .otherwise(0L)).as("n_control"),
        sum(when($"text".contains("�"), 1L).otherwise(0L))
          .as("n_replacement"))
      .withColumn("non_ascii_rate",
        $"n_non_ascii".cast("double") / $"n_docs")
      .orderBy($"source")
  }

  private val etlEncodingAuditSql =
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN regexp_matches(text, '[^\x00-\x7F]')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_non_ascii,
      |  CAST(sum(CASE WHEN regexp_matches(text, '[\x00-\x08\x0B\x0C\x0E-\x1F]')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_control,
      |  CAST(sum(CASE WHEN contains(text, chr(65533))
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_replacement,
      |  CAST(sum(CASE WHEN regexp_matches(text, '[^\x00-\x7F]')
      |    THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS non_ascii_rate
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** Watermark-lateness audit: how far behind the running event-time
    * high-water mark does each arriving event sit (arrival order =
    * event_id), bucketed into an operations histogram — the number
    * that SIZES a streaming job's watermark delay before deploy. The
    * running max uses the PrefixSum bucket-offset two-pass (per-bucket
    * maxima → serial prefix over bucket metadata → within-bucket
    * parallel window), never a single-partition global window.
    * Lateness stays integer microseconds; bucket edges are integer
    * second compares.
    */
  def etlWatermarkAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the synthetic stream arrives perfectly ordered (event_id is the
    // ts order), so a deterministic md5 jitter displaces each event
    // by up to 1000 arrival slots — the audit then has real work and
    // the oracle replays the identical jitter (the text_redact_pii
    // synthesize-then-verify recipe)
    val e = Tables(spark, dir).events
      .select($"event_id", unix_micros($"ts").as("us"))
      .withColumn("arrival", $"event_id" +
        conv(substring(md5($"event_id".cast("string")), 1, 4), 16, 10)
          .cast("long") % 1000)
    val rm = graft.operators.PrefixSum.runningMax(e,
      orderCol = struct($"arrival", $"event_id"),
      bucket = expr("arrival div 100000"),
      name = "us", maxCol = $"us")
    // integer `div`, not `/`+cast — the Triangles wedge-math rule
    val lat = rm.select(expr("(runmax_us - us) div 1000000").as("late_s"))
    lat.select(
      when($"late_s" === 0, 0L).when($"late_s" <= 60, 1L)
        .when($"late_s" <= 3600, 2L).when($"late_s" <= 86400, 3L)
        .otherwise(4L).as("bucket"),
      $"late_s")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"), max($"late_s").as("max_late_s"))
      .withColumn("label",
        when($"bucket" === 0, "on_time").when($"bucket" === 1, "<=1m")
          .when($"bucket" === 2, "<=1h").when($"bucket" === 3, "<=1d")
          .otherwise(">1d"))
      .select($"bucket", $"label", $"n", $"max_late_s")
      .orderBy($"bucket")
  }

  private val etlWatermarkAuditSql =
    """WITH j AS (
      |  SELECT event_id, epoch_us(ts) AS us,
      |    event_id + CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 4))
      |      AS BIGINT) % 1000 AS arrival
      |  FROM events),
      |rm AS (
      |  SELECT us,
      |    max(us) OVER (ORDER BY arrival, event_id) AS runmax_us
      |  FROM j),
      |lat AS (SELECT (runmax_us - us) // 1000000 AS late_s FROM rm),
      |b AS (
      |  SELECT CASE WHEN late_s = 0 THEN 0 WHEN late_s <= 60 THEN 1
      |    WHEN late_s <= 3600 THEN 2 WHEN late_s <= 86400 THEN 3
      |    ELSE 4 END AS bucket, late_s
      |  FROM lat)
      |SELECT CAST(bucket AS BIGINT) AS bucket,
      |  CASE WHEN bucket = 0 THEN 'on_time' WHEN bucket = 1 THEN '<=1m'
      |    WHEN bucket = 2 THEN '<=1h' WHEN bucket = 3 THEN '<=1d'
      |    ELSE '>1d' END AS label,
      |  count(*) AS n, max(late_s) AS max_late_s
      |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Incremental view maintenance of a revenue-by-priority aggregate:
    * the lake's standing aggregate is MAINTAINED by merging the
    * previous state (orders before the refresh horizon) with a delta
    * aggregate (the trailing 30 days), never re-scanning history —
    * the shape that turns a nightly 100 TB recompute into a
    * delta-sized one. The merge is a full-outer union of partial
    * aggregates (counts and integer cent sums are associative,
    * re-aggregable partials). The gate's point: the DuckDB oracle
    * computes the SAME table DIRECTLY from the full table, so the
    * hash-match PROVES state + delta ≡ full recompute against an
    * independent engine. The horizon derives from max(o_orderdate),
    * never wall-clock (replayable on any snapshot).
    */
  def qIvmAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables(spark, dir).orders
      .select($"o_orderpriority",
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("day"),
        round($"o_totalprice" * 100).cast("long").as("cents"))
    val horizon = orders.agg((max($"day") - 30).as("h"))
    val tagged = orders.crossJoin(broadcast(horizon))
    // standing state: everything before the horizon (in production
    // this is a table read back, not recomputed — recomputed here so
    // the gate is self-contained on one snapshot)
    val state = tagged.filter($"day" < $"h")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"), sum($"cents").as("cents"))
    val delta = tagged.filter($"day" >= $"h")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"), sum($"cents").as("cents"))
    state.select($"o_orderpriority", $"n", $"cents")
      .unionByName(delta.select($"o_orderpriority", $"n", $"cents"))
      .groupBy($"o_orderpriority")
      .agg(sum($"n").as("n_orders"), sum($"cents").as("rev_cents"))
      .orderBy($"o_orderpriority")
  }

  private val qIvmAggSql =
    """SELECT o_orderpriority, count(*) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  /** Rollup cascade: the monthly aggregate is computed FROM the daily
    * aggregate's partials (sums of sums, counts of counts), not from
    * raw rows — the materialized-hierarchy pattern where each coarser
    * tier reads the finer tier, so raw data is scanned exactly once
    * however many tiers exist. The oracle computes the monthly table
    * DIRECTLY from raw events, proving re-aggregation legality
    * end-to-end. `n_days` additionally pins that the daily tier
    * really was the source (a direct monthly scan could not produce
    * it without a second pass).
    */
  def qRollupCascade(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables(spark, dir).events
      .filter($"event_type" === "purchase")
      .groupBy($"event_type", expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"), sum(round($"value" * 100).cast("long")).as("cents"))
    daily
      .groupBy($"event_type", expr("day div 30").as("month"))
      .agg(count(lit(1)).as("n_days"), sum($"n").as("n_events"), sum($"cents").as("cents"))
      .orderBy($"month")
  }

  private val qRollupCascadeSql =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    count(*) AS n,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      |SELECT event_type, day // 30 AS month,
      |  count(*) AS n_days, CAST(sum(n) AS BIGINT) AS n_events,
      |  CAST(sum(cents) AS BIGINT) AS cents
      |FROM daily GROUP BY 1, 2 ORDER BY month""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("q_ivm_agg", qIvmAgg _, qIvmAggSql),
    QueryDef.sql("q_rollup_cascade", qRollupCascade _, qRollupCascadeSql),
    QueryDef.sql("etl_watermark_audit", etlWatermarkAudit _, etlWatermarkAuditSql),
    QueryDef.sql("etl_encoding_audit", etlEncodingAudit _, etlEncodingAuditSql),
    QueryDef.sql("etl_fd_discovery", etlFdDiscovery _, etlFdDiscoverySql),
    QueryDef.sql("etl_fk_integrity", etlFkIntegrity _, etlFkIntegritySql),
    QueryDef.sql("etl_binpack", etlBinpack _, etlBinpackSql),
    QueryDef.sql("q_skew_profile", qSkewProfile _, qSkewProfileSql))
}
