package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 wave S — data-governance operators: keyed pseudonymization
  * with a referential-integrity proof, a subject-access audit (the
  * GDPR "what do you hold about me" export), and a retention sweep
  * with parent-child cascade semantics. Together with the existing
  * right-to-forget / k-anonymity / l-diversity gates this completes
  * the privacy-ops surface a 100 TB lake needs.
  *
  * Scale design: pseudonymization is a pure map-side md5 expression
  * (no lookup table to ship or protect — the token derives from the
  * key); the integrity proof re-joins on the token with the same
  * hash-join shape as the raw key. The audit and sweep reduce to
  * key- or table-cardinality outputs with one broadcast scalar each.
  */
object GovQ {

  /** Deterministic keyed token: 16 hex chars of md5('pseud:' ++ key).
    * A map-side expression — referential integrity is preserved by
    * construction because equal keys map to equal tokens.
    */
  private def tok(keyExpr: String): String =
    s"substring(md5(concat('pseud:', CAST($keyExpr AS STRING))), 1, 16)"

  private def tokSql(keyExpr: String): String =
    s"substr(md5('pseud:' || CAST($keyExpr AS VARCHAR)), 1, 16)"

  // ------------------------------------------------------ etl_pseudonymize
  /** Pseudonymize the customer key on both sides of the
    * customer↔orders relationship and PROVE the join survives: per
    * nation, the order count through the token join must equal the
    * raw-key join. Output also carries the lexicographic min token as
    * a stable sample.
    */
  def etlPseudonymize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val c = t.customer.select($"c_custkey", $"c_nationkey",
      expr(tok("c_custkey")).as("ctok"))
    val o = t.orders.select($"o_custkey", expr(tok("o_custkey")).as("otok"))
    val raw = c.join(o, $"c_custkey" === $"o_custkey")
      .groupBy($"c_nationkey").agg(count(lit(1)).as("n_orders_raw"))
    val viaTok = c.join(o, $"ctok" === $"otok")
      .groupBy($"c_nationkey").agg(count(lit(1)).as("n_orders_tok"))
    val perNation = c.groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_cust"), min($"ctok").as("sample_token"))
    perNation
      .join(raw, Seq("c_nationkey"), "left")
      .join(viaTok, Seq("c_nationkey"), "left")
      .join(broadcast(t.nation.select($"n_nationkey", $"n_name")),
        $"c_nationkey" === $"n_nationkey")
      .select($"n_name", $"n_cust",
        coalesce($"n_orders_raw", lit(0L)).as("n_orders_raw"),
        coalesce($"n_orders_tok", lit(0L)).as("n_orders_tok"),
        $"sample_token")
      .orderBy($"n_name")
  }

  private val etlPseudonymizeSql =
    s"""WITH c AS (
       |  SELECT c_custkey, c_nationkey, ${tokSql("c_custkey")} AS ctok
       |  FROM customer),
       |o AS (SELECT o_custkey, ${tokSql("o_custkey")} AS otok FROM orders),
       |raw AS (
       |  SELECT c_nationkey, count(*) AS n_orders_raw
       |  FROM c JOIN o ON c_custkey = o_custkey GROUP BY 1),
       |vt AS (
       |  SELECT c_nationkey, count(*) AS n_orders_tok
       |  FROM c JOIN o ON ctok = otok GROUP BY 1),
       |pn AS (
       |  SELECT c_nationkey, count(*) AS n_cust, min(ctok) AS sample_token
       |  FROM c GROUP BY 1)
       |SELECT n_name, n_cust,
       |  coalesce(n_orders_raw, 0) AS n_orders_raw,
       |  coalesce(n_orders_tok, 0) AS n_orders_tok, sample_token
       |FROM pn
       |LEFT JOIN raw USING (c_nationkey)
       |LEFT JOIN vt USING (c_nationkey)
       |JOIN nation ON c_nationkey = n_nationkey
       |ORDER BY n_name""".stripMargin

  // ----------------------------------------------------- etl_subject_audit
  /** Subject-access audit for one deterministic subject (the customer
    * minimizing (md5(name), key)): per-table row counts, money totals
    * and date ranges — the index page of a GDPR export. Missing date
    * ranges surface as the -1 sentinel so the row stays typed long.
    */
  def etlSubjectAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val subj = t.customer
      .select($"c_custkey", md5($"c_name").as("h"), $"c_acctbal")
      .agg(min(struct($"h", $"c_custkey", $"c_acctbal")).as("m"))
      .select($"m.c_custkey".as("sk"),
        expr("CAST(round(m.c_acctbal * 100) AS BIGINT)").as("bal_cents"))
    val o = t.orders.join(broadcast(subj), $"o_custkey" === $"sk")
    val ordersRow = o.agg(count(lit(1)).as("n_rows"),
        coalesce(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")), lit(0L)).as("cents"),
        coalesce(min(expr("unix_micros(o_orderdate) div 86400000000")), lit(-1L)).as("day_min"),
        coalesce(max(expr("unix_micros(o_orderdate) div 86400000000")), lit(-1L)).as("day_max"))
      .select(lit("orders").as("tbl"), $"n_rows", $"cents", $"day_min", $"day_max")
    val lis = t.lineitem.join(
      o.select($"o_orderkey"), $"l_orderkey" === $"o_orderkey")
    val lineRow = lis.agg(count(lit(1)).as("n_rows"),
        coalesce(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")), lit(0L)).as("cents"),
        coalesce(min(expr("unix_micros(l_shipdate) div 86400000000")), lit(-1L)).as("day_min"),
        coalesce(max(expr("unix_micros(l_shipdate) div 86400000000")), lit(-1L)).as("day_max"))
      .select(lit("lineitem").as("tbl"), $"n_rows", $"cents", $"day_min", $"day_max")
    val custRow = subj.select(lit("customer").as("tbl"), lit(1L).as("n_rows"),
      $"bal_cents".as("cents"), lit(-1L).as("day_min"), lit(-1L).as("day_max"))
    custRow.unionByName(ordersRow).unionByName(lineRow).orderBy($"tbl")
  }

  private val etlSubjectAuditSql =
    """WITH s AS (
      |  SELECT c_custkey AS sk, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
      |  FROM customer ORDER BY md5(c_name), c_custkey LIMIT 1),
      |o AS (SELECT orders.* FROM orders, s WHERE o_custkey = sk),
      |orow AS (
      |  SELECT 'orders' AS tbl, count(*) AS n_rows,
      |    coalesce(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT), 0) AS cents,
      |    coalesce(min(epoch_us(o_orderdate) // 86400000000), -1) AS day_min,
      |    coalesce(max(epoch_us(o_orderdate) // 86400000000), -1) AS day_max
      |  FROM o),
      |lrow AS (
      |  SELECT 'lineitem' AS tbl, count(*) AS n_rows,
      |    coalesce(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT), 0) AS cents,
      |    coalesce(min(epoch_us(l_shipdate) // 86400000000), -1) AS day_min,
      |    coalesce(max(epoch_us(l_shipdate) // 86400000000), -1) AS day_max
      |  FROM lineitem JOIN o ON l_orderkey = o_orderkey),
      |crow AS (
      |  SELECT 'customer' AS tbl, CAST(1 AS BIGINT) AS n_rows, bal_cents AS cents,
      |    CAST(-1 AS BIGINT) AS day_min, CAST(-1 AS BIGINT) AS day_max
      |  FROM s)
      |SELECT * FROM crow UNION ALL SELECT * FROM orow UNION ALL SELECT * FROM lrow
      |ORDER BY tbl""".stripMargin

  // --------------------------------------------------- etl_retention_sweep
  /** Retention sweep at the mid-range cutoff day: orders purge by
    * their own date, lineitems purge by CASCADE from their parent
    * order (never by their own date — a line shipped after the cutoff
    * still purges with its order), and customers report
    * dormant-vs-active by their latest surviving order. One scalar
    * broadcast; three table-cardinality aggregates.
    */
  def etlRetentionSweep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val o = t.orders.select($"o_orderkey", $"o_custkey",
      expr("unix_micros(o_orderdate) div 86400000000").as("oday"))
    val cut = o.agg(expr("(min(oday) + max(oday) + 1) div 2").as("cutoff"))
    val oc = o.crossJoin(broadcast(cut)).withColumn("purge", $"oday" < $"cutoff")
    val oRow = oc.agg(sum(when($"purge", 1L).otherwise(0L)).as("purged"),
        sum(when(!$"purge", 1L).otherwise(0L)).as("kept"))
      .select(lit("orders").as("tbl"), $"purged", $"kept")
    val lRow = t.lineitem.select($"l_orderkey")
      .join(oc.select($"o_orderkey", $"purge"), $"l_orderkey" === $"o_orderkey")
      .agg(sum(when($"purge", 1L).otherwise(0L)).as("purged"),
        sum(when(!$"purge", 1L).otherwise(0L)).as("kept"))
      .select(lit("lineitem").as("tbl"), $"purged", $"kept")
    val lastKept = oc.groupBy($"o_custkey")
      .agg(max(when(!$"purge", $"oday")).as("last_kept"))
    val cRow = t.customer.select($"c_custkey")
      .join(lastKept, $"c_custkey" === $"o_custkey", "left")
      .agg(sum(when($"last_kept".isNull, 1L).otherwise(0L)).as("purged"),
        sum(when($"last_kept".isNotNull, 1L).otherwise(0L)).as("kept"))
      .select(lit("customer").as("tbl"), $"purged", $"kept")
    oRow.unionByName(lRow).unionByName(cRow).orderBy($"tbl")
  }

  private val etlRetentionSweepSql =
    """WITH o AS (
      |  SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) // 86400000000 AS oday
      |  FROM orders),
      |cut AS (SELECT (min(oday) + max(oday) + 1) // 2 AS cutoff FROM o),
      |oc AS (SELECT o.*, oday < cutoff AS purge FROM o, cut),
      |orow AS (
      |  SELECT 'orders' AS tbl,
      |    CAST(sum(CASE WHEN purge THEN 1 ELSE 0 END) AS BIGINT) AS purged,
      |    CAST(sum(CASE WHEN NOT purge THEN 1 ELSE 0 END) AS BIGINT) AS kept
      |  FROM oc),
      |lrow AS (
      |  SELECT 'lineitem' AS tbl,
      |    CAST(sum(CASE WHEN purge THEN 1 ELSE 0 END) AS BIGINT) AS purged,
      |    CAST(sum(CASE WHEN NOT purge THEN 1 ELSE 0 END) AS BIGINT) AS kept
      |  FROM lineitem JOIN oc ON l_orderkey = o_orderkey),
      |lk AS (
      |  SELECT o_custkey, max(CASE WHEN NOT purge THEN oday END) AS last_kept
      |  FROM oc GROUP BY 1),
      |crow AS (
      |  SELECT 'customer' AS tbl,
      |    CAST(sum(CASE WHEN last_kept IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS purged,
      |    CAST(sum(CASE WHEN last_kept IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS kept
      |  FROM customer LEFT JOIN lk ON c_custkey = o_custkey)
      |SELECT * FROM orow UNION ALL SELECT * FROM lrow UNION ALL SELECT * FROM crow
      |ORDER BY tbl""".stripMargin

  // ---------------------------------------------------------------- registry

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("etl_pseudonymize", etlPseudonymize _, etlPseudonymizeSql),
    QueryDef.sql("etl_subject_audit", etlSubjectAudit _, etlSubjectAuditSql),
    QueryDef.sql("etl_retention_sweep", etlRetentionSweep _, etlRetentionSweepSql))
}
