package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 API-surface wave: the native extension expressions driven
  * through the SQL face as a GATE (not just ExtensionsSpec), join
  * hints proven result-neutral, and exact decimal money arithmetic.
  */
object SqlFaceQ {

  // --------------------------------------------------------- q_sql_extensions

  /** The `GraftExtensions`-registered native expressions exercised
    * end-to-end through `spark.sql`: consecutive documents compare by
    * `sorted_intersect_size` (codegen'd merge intersect) and
    * `word_ngrams` trigram counts — SQL that only parses because the
    * extension injected the functions. Outputs quantize to exact
    * integers; the oracle recomputes both with DuckDB list algebra.
    * One broadcastable self-join on doc_id+1.
    */
  def qSqlExtensions(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir).documents.createOrReplaceTempView("documents")
    spark.sql(
      s"""SELECT a.doc_id,
         |  sorted_intersect_size(
         |    array_sort(array_distinct(${toksSpark("a.text")})),
         |    array_sort(array_distinct(${toksSpark("b.text")}))) AS common_tokens,
         |  size(word_ngrams(${toksSpark("a.text")}, 3)) AS n_trigrams
         |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
         |ORDER BY a.doc_id""".stripMargin)
  }

  private def toksSpark(c: String) = s"split(lower(trim($c)), '\\\\s+')"

  private val qSqlExtensionsSql = {
    def t(c: String) = QueryDef.toksSql(c)
    s"""SELECT a.doc_id,
       |  CAST(len(list_intersect(list_distinct(${t("a.text")}),
       |                          list_distinct(${t("b.text")}))) AS BIGINT) AS common_tokens,
       |  CAST(greatest(len(${t("a.text")}) - 2, 0) AS INTEGER) AS n_trigrams
       |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
       |ORDER BY a.doc_id""".stripMargin
  }

  // ------------------------------------------------------------ q_join_hints

  /** Join-strategy hints through the SQL face: the same star
    * aggregate computed with an explicit BROADCAST hint on the
    * dimension and with SHUFFLE_HASH forced — both must reproduce the
    * plain plan's numbers exactly (hints steer the physical strategy,
    * never the result; PlanSpec pins the strategies actually
    * diverge). The gate emits both side by side.
    */
  def qJoinHints(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer.createOrReplaceTempView("customer")
    t.orders.createOrReplaceTempView("orders")
    spark.sql(
      """WITH bc AS (
        |  SELECT /*+ BROADCAST(customer) */ c_mktsegment,
        |    count(*) AS n, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY c_mktsegment),
        |sh AS (
        |  SELECT /*+ SHUFFLE_HASH(customer) */ c_mktsegment,
        |    count(*) AS n, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY c_mktsegment)
        |SELECT bc.c_mktsegment, bc.n AS n_broadcast, sh.n AS n_shuffle,
        |  bc.cents AS cents_broadcast, sh.cents AS cents_shuffle
        |FROM bc JOIN sh ON bc.c_mktsegment = sh.c_mktsegment
        |ORDER BY bc.c_mktsegment""".stripMargin)
  }

  private val qJoinHintsSql =
    """WITH j AS (
      |  SELECT c_mktsegment, count(*) AS n,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY c_mktsegment)
      |SELECT c_mktsegment, n AS n_broadcast, n AS n_shuffle,
      |  cents AS cents_broadcast, cents AS cents_shuffle
      |FROM j ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------- q_decimal_money

  /** Exact decimal money arithmetic: revenue per priority summed as
    * DECIMAL(18,2) — no floating-point drift at any row count, the
    * finance-grade aggregation path. Delivered as exact cents longs
    * (cross-engine decimal RENDERING is not a contract; the decimal
    * math in-plan is) and proven IN-PLAN equal to the repo's
    * integer-cents discipline (per-row round(×100) longs) — two
    * independent exact paths that must agree on any engine. A raw
    * double sum is deliberately absent: at fact-table scale its
    * cents-rounding is summation-order-dependent, which is the whole
    * reason these two paths exist.
    */
  def qDecimalMoney(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).orders
      .groupBy($"o_orderpriority".as("prio"))
      .agg(count(lit(1)).as("n"),
        expr("cast(sum(cast(o_totalprice as decimal(18,2))) * 100 as bigint)")
          .as("cents_decimal"),
        sum(round($"o_totalprice" * 100).cast("long")).as("cents_integer"))
      .withColumn("paths_agree", $"cents_decimal" === $"cents_integer")
      .orderBy($"prio")
  }

  private val qDecimalMoneySql =
    """SELECT o_orderpriority AS prio, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents_decimal,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_integer,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
      |    = CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS paths_agree
      |FROM orders GROUP BY prio ORDER BY prio""".stripMargin

  // ---------------------------------------------------------------- registry

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("q_sql_extensions", qSqlExtensions _, qSqlExtensionsSql),
    QueryDef.sql("q_join_hints", qJoinHints _, qJoinHintsSql),
    QueryDef.sql("q_decimal_money", qDecimalMoney _, qDecimalMoneySql))
}
