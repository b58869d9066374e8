package graft.queries

import graft.Tables
import graft.etl.{Manifest, Normalize, Validation}
import graft.sources.SniffCsv
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Intake/ETL surface (SURVEY.md §2.1) wired into the correctness
  * gate. Each query re-expresses a reference behavior over the lake
  * tables so DuckDB can oracle it.
  */
object Etl {

  /** End-to-end intake proof: emit `nation` as a `;`-delimited CSV,
    * re-ingest through the sniffing reader (which must detect `;` and
    * UTF-8), cast back, and match the identity oracle.
    */
  def etlCsvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tmp = s"/tmp/graft_csv/${dir.replaceAll("[^A-Za-z0-9]", "_")}/nation"
    Tables(spark, dir).nation
      .coalesce(1).write.mode("overwrite")
      .option("header", "true").option("delimiter", ";")
      .csv(tmp)
    SniffCsv.read(spark, tmp)
      .select($"n_nationkey".cast("int").as("n_nationkey"), $"n_name",
        $"n_regionkey".cast("int").as("n_regionkey"))
      .orderBy($"n_nationkey")
  }

  private val etlCsvRoundtripSql =
    "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"

  /** XLSX intake proof (reference pd.read_excel dtype=str,
    * streamlit_app.py:172-174): emit `nation` as a real .xlsx (ZIP of
    * XML, inline strings), re-ingest through the dependency-free StAX
    * reader, cast back, and match the identity oracle.
    */
  def etlXlsxRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tmp = s"/tmp/graft_xlsx/${dir.replaceAll("[^A-Za-z0-9]", "_")}/nation.xlsx"
    graft.sources.Xlsx.writeTable(spark, Tables(spark, dir).nation, tmp)
    graft.sources.Intake.read(spark, tmp)
      .select($"n_nationkey".cast("int").as("n_nationkey"), $"n_name",
        $"n_regionkey".cast("int").as("n_regionkey"))
      .orderBy($"n_nationkey")
  }

  private val etlXlsxRoundtripSql =
    "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"

  /** XML sink/source round-trip through Spark 4's BUILT-IN xml data
    * source (the spark-xml lineage, in sql/core since 4.0) — the
    * fourth intake format a real ingest surface meets after
    * CSV/XLSX/JSON. Writes `nation` as one row-tagged XML document
    * set, re-reads with an explicit schema (inference off: schema-on
    * -read for XML is a per-file scan) and matches the identity
    * oracle.
    */
  def etlXmlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tmp = s"/tmp/graft_xml/${dir.replaceAll("[^A-Za-z0-9]", "_")}/nation"
    Tables(spark, dir).nation
      .coalesce(1).write.mode("overwrite")
      .option("rootTag", "nations").option("rowTag", "nation")
      .format("xml").save(tmp)
    spark.read
      .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
      .option("rowTag", "nation").format("xml").load(tmp)
      .select($"n_nationkey", $"n_name", $"n_regionkey")
      .orderBy($"n_nationkey")
  }

  private val etlXmlRoundtripSql =
    "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"

  /** ORC sink/source round-trip (Spark-native columnar alternative —
    * same identity oracle as the CSV path).
    */
  def etlOrcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tmp = s"/tmp/graft_orc/${dir.replaceAll("[^A-Za-z0-9]", "_")}/region"
    Tables(spark, dir).region.write.mode("overwrite").orc(tmp)
    spark.read.orc(tmp).orderBy($"r_regionkey")
  }

  private val etlOrcRoundtripSql =
    "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"

  /** JSON-lines sink/source round-trip with explicit schema-on-read
    * (JSON loses int width without it).
    */
  def etlJsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tmp = s"/tmp/graft_json/${dir.replaceAll("[^A-Za-z0-9]", "_")}/supplier"
    val src = Tables(spark, dir).supplier
    src.write.mode("overwrite").json(tmp)
    spark.read.schema(src.schema).json(tmp)
      .select($"s_suppkey", $"s_name", $"s_nationkey", round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  private val etlJsonRoundtripSql =
    """SELECT s_suppkey, s_name, s_nationkey, round(s_acctbal, 4) AS s_acctbal
      |FROM supplier ORDER BY s_suppkey""".stripMargin

  /** Row-level rule engine over customer — distributed version of the
    * reference's per-file discrepancy list.
    */
  def etlValidateRows(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rules = Seq(
      Validation.Rule("negative_balance", $"c_acctbal" < 0.0),
      Validation.Rule("blank_name", trim($"c_name") === ""),
      Validation.Rule("bad_nation", !$"c_nationkey".between(0, 24)),
      Validation.Rule("bad_segment", !$"c_mktsegment".isin(
        "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")))
    Validation.annotate(Tables(spark, dir).customer, rules)
      .select($"c_custkey", $"issues", $"acceptable")
      .orderBy($"c_custkey")
  }

  private val etlValidateRowsSql =
    """SELECT c_custkey,
      |  concat_ws(',',
      |    CASE WHEN c_acctbal < 0.0 THEN 'negative_balance' END,
      |    CASE WHEN trim(c_name) = '' THEN 'blank_name' END,
      |    CASE WHEN c_nationkey NOT BETWEEN 0 AND 24 THEN 'bad_nation' END,
      |    CASE WHEN c_mktsegment NOT IN ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY')
      |      THEN 'bad_segment' END) AS issues,
      |  concat_ws(',',
      |    CASE WHEN c_acctbal < 0.0 THEN 'negative_balance' END,
      |    CASE WHEN trim(c_name) = '' THEN 'blank_name' END,
      |    CASE WHEN c_nationkey NOT BETWEEN 0 AND 24 THEN 'bad_nation' END,
      |    CASE WHEN c_mktsegment NOT IN ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY')
      |      THEN 'bad_segment' END) = '' AS acceptable
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  /** Table-level structural summaries (reference's file checks). */
  def etlValidateFiles(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    Seq("customer", "orders", "documents")
      .map(n => Validation.tableSummary(t.byName(n), n))
      .reduce(_.unionByName(_))
      .orderBy(col("table_name"))
  }

  private val etlValidateFilesSql =
    """SELECT 'customer' AS table_name, count(*) AS n_rows, CAST(5 AS BIGINT) AS n_cols,
      |       false AS blank_headers, false AS dup_headers FROM customer
      |UNION ALL
      |SELECT 'orders', count(*), 6, false, false FROM orders
      |UNION ALL
      |SELECT 'documents', count(*), 5, false, false FROM documents
      |ORDER BY table_name""".stripMargin

  /** Canonical all-string normalization (reference dtype=str + fillna). */
  def etlNormalize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Normalize.allString(Tables(spark, dir).nation)
      .orderBy($"n_nationkey".cast("int"))
  }

  private val etlNormalizeSql =
    """SELECT CAST(n_nationkey AS VARCHAR) AS n_nationkey,
      |  trim(CAST(n_name AS VARCHAR)) AS n_name,
      |  CAST(n_regionkey AS VARCHAR) AS n_regionkey
      |FROM nation ORDER BY n_nationkey""".stripMargin

  /** Safe-name sanitization over part names (reference SAFE_CHAR_RE). */
  def etlSanitize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).part
      .select($"p_partkey", Normalize.sanitize($"p_name").as("safe_name"),
        Normalize.sanitize($"p_type").as("safe_type"))
      .orderBy($"p_partkey")
  }

  private val etlSanitizeSql =
    """SELECT p_partkey,
      |  regexp_replace(p_name, '[^A-Za-z0-9._-]', '_', 'g') AS safe_name,
      |  regexp_replace(p_type, '[^A-Za-z0-9._-]', '_', 'g') AS safe_type
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Ingestion manifest across the whole lake (reference manifest.json). */
  def etlManifest(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    Manifest.build(t, t.names)
  }

  private val etlManifestSql =
    """SELECT 'customer' AS table_name, count(*) AS n_rows, CAST(5 AS BIGINT) AS n_cols FROM customer
      |UNION ALL SELECT 'documents', count(*), 5 FROM documents
      |UNION ALL SELECT 'embeddings', count(*), 3 FROM embeddings
      |UNION ALL SELECT 'events', count(*), 6 FROM events
      |UNION ALL SELECT 'lineitem', count(*), 11 FROM lineitem
      |UNION ALL SELECT 'nation', count(*), 3 FROM nation
      |UNION ALL SELECT 'orders', count(*), 6 FROM orders
      |UNION ALL SELECT 'part', count(*), 6 FROM part
      |UNION ALL SELECT 'region', count(*), 2 FROM region
      |UNION ALL SELECT 'supplier', count(*), 4 FROM supplier
      |ORDER BY table_name""".stripMargin

  /** Latest-wins upsert: apply a derived update set (every 10th
    * customer gets +100 balance) over the base table; updates must
    * override, everyone else unchanged. Oracle recomputes the merge
    * relationally.
    */
  def etlUpsert(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables(spark, dir).customer
    val updates = base.filter($"c_custkey" % 10 === 0)
      .withColumn("c_acctbal", round($"c_acctbal" + 100.0, 4))
    graft.etl.Upsert.latestWins(base, updates, Seq("c_custkey"), lit(0))
      .select($"c_custkey", $"c_name", round($"c_acctbal", 4).as("c_acctbal"))
      .orderBy($"c_custkey")
  }

  private val etlUpsertSql =
    """SELECT c_custkey, c_name,
      |  round(CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END, 4) AS c_acctbal
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  /** SCD-2 history over a synthetic customer change stream: v1 = every
    * customer, v2 = a third get a balance bump, v3 = a ninth get
    * another — [[graft.etl.Scd2.history]] turns the stream into
    * validity intervals. Oracle: the identical lead() window in SQL.
    */
  def etlScd2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables(spark, dir).customer.select($"c_custkey", $"c_acctbal")
      .withColumn("version", lit(1L))
    val v2 = base.filter($"c_custkey" % 3 === 0)
      .withColumn("c_acctbal", $"c_acctbal" + 50.0).withColumn("version", lit(2L))
    val v3 = base.filter($"c_custkey" % 9 === 0)
      .withColumn("c_acctbal", $"c_acctbal" + 75.0).withColumn("version", lit(3L))
    graft.etl.Scd2.history(base.unionByName(v2).unionByName(v3), Seq("c_custkey"), "version")
      .select($"c_custkey", $"version", round($"c_acctbal", 4).as("acctbal"),
        $"valid_from", $"valid_to", $"is_current")
      .orderBy($"c_custkey", $"version")
  }

  private val etlScd2Sql =
    """WITH changes AS (
      |  SELECT c_custkey, c_acctbal, CAST(1 AS BIGINT) AS version FROM customer
      |  UNION ALL
      |  SELECT c_custkey, c_acctbal + 50.0, CAST(2 AS BIGINT) FROM customer WHERE c_custkey % 3 = 0
      |  UNION ALL
      |  SELECT c_custkey, c_acctbal + 75.0, CAST(3 AS BIGINT) FROM customer WHERE c_custkey % 9 = 0)
      |SELECT c_custkey, version, round(c_acctbal, 4) AS acctbal,
      |  version AS valid_from,
      |  lead(version) OVER w AS valid_to,
      |  lead(version) OVER w IS NULL AS is_current
      |FROM changes
      |WINDOW w AS (PARTITION BY c_custkey ORDER BY version)
      |ORDER BY c_custkey, version""".stripMargin

  /** Z-order clustering code over orders: customer key × order day
    * interleaved — the layout key a data-skipping write sorts by. The
    * gate emits the code itself so the oracle replays every shift and
    * mask; the file-level min/max-bounding effect is measured in
    * ZOrderSpec.
    */
  def etlZorder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).orders
      .select($"o_orderkey",
        graft.etl.ZOrder.zcode2(
          $"o_custkey",
          datediff(to_date($"o_orderdate"), to_date(lit("1992-01-01")))
        ).as("zcode"))
      .orderBy($"o_orderkey")
  }

  private val etlZorderSql = {
    val z = graft.etl.ZOrder.zcode2Sql(
      "CAST(o_custkey AS BIGINT)",
      "CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)")
    s"SELECT o_orderkey, $z AS zcode FROM orders ORDER BY o_orderkey"
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("etl_zorder", etlZorder _, etlZorderSql),
    QueryDef.sql("etl_scd2", etlScd2 _, etlScd2Sql),
    QueryDef.sql("etl_upsert", etlUpsert _, etlUpsertSql),
    QueryDef.sql("etl_csv_roundtrip", etlCsvRoundtrip _, etlCsvRoundtripSql),
    QueryDef.sql("etl_xlsx_roundtrip", etlXlsxRoundtrip _, etlXlsxRoundtripSql),
    QueryDef.sql("etl_orc_roundtrip", etlOrcRoundtrip _, etlOrcRoundtripSql),
    QueryDef.sql("etl_xml_roundtrip", etlXmlRoundtrip _, etlXmlRoundtripSql),
    QueryDef.sql("etl_json_roundtrip", etlJsonRoundtrip _, etlJsonRoundtripSql),
    QueryDef.sql("etl_validate_rows", etlValidateRows _, etlValidateRowsSql),
    QueryDef.sql("etl_validate_files", etlValidateFiles _, etlValidateFilesSql),
    QueryDef.sql("etl_normalize", etlNormalize _, etlNormalizeSql),
    QueryDef.sql("etl_sanitize", etlSanitize _, etlSanitizeSql),
    QueryDef.sql("etl_manifest", etlManifest _, etlManifestSql))
}
