package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 intake-reconciliation gate: fuzzy header mapping — the
  * reference's real-world problem one step further (distributor
  * files arrive with misspelled/reshaped headers; the intake must
  * map them onto the canonical schema before validation can run).
  */
object HeaderQ {

  /** Canonical orders schema — the mapping target. A fixed contract,
    * shared verbatim with the oracle.
    */
  private val Canonical = Seq(
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  // ------------------------------------------------------------ etl_header_map

  /** Fuzzy header mapping: incoming headers are deterministic
    * corruptions of the canonical names (one md5-positioned char
    * dropped, one underscore swap — the typo classes intake actually
    * sees), each mapped to its nearest canonical column by
    * Levenshtein distance with a ≤3 acceptance fence and (distance,
    * name) tie-break. Everything is metadata arithmetic over a
    * #columns² table — the matching scales with schema width, never
    * data volume; the codegen'd `levenshtein` does the work on both
    * engines identically.
    */
  def etlHeaderMap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val canon = Canonical.toDF("canonical")
    // incoming headers derive from the LAKE's actual schema-on-read
    // (parquet footer of the orders table) — the oracle uses the same
    // names as the fixed schema contract
    val incoming = graft.Tables(spark, dir).orders.columns.toSeq.toDF("orig")
      // drop the char at (md5-derived position mod len), then swap
      // '_' for ' ' — deterministic, oracle-replayable corruption
      .select(expr(
        """replace(concat(
          |  substring(orig, 1, cast(conv(substring(md5(orig), 1, 4), 16, 10) as int) % length(orig)),
          |  substring(orig, cast(conv(substring(md5(orig), 1, 4), 16, 10) as int) % length(orig) + 2)),
          |'_', ' ')""".stripMargin).as("header"))
    val scored = incoming.crossJoin(broadcast(canon))
      .select($"header", $"canonical",
        levenshtein($"header", $"canonical").cast("long").as("distance"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"header").orderBy($"distance", $"canonical")))
      .filter($"rk" === 1)
    scored.select($"header", $"canonical".as("mapped_to"), $"distance",
        ($"distance" <= 3).as("accepted"))
      .orderBy($"header")
  }

  private val etlHeaderMapSql = {
    val canon = Canonical.map(c => s"('$c')").mkString(", ")
    s"""WITH canon AS (SELECT * FROM (VALUES $canon) t(canonical)),
       |incoming AS (
       |  SELECT replace(
       |    substring(canonical, 1, CAST(('0x' || substr(md5(canonical), 1, 4)) AS BIGINT) % length(canonical))
       |      || substring(canonical, CAST(('0x' || substr(md5(canonical), 1, 4)) AS BIGINT) % length(canonical) + 2),
       |    '_', ' ') AS header
       |  FROM canon),
       |scored AS (
       |  SELECT header, canonical,
       |    CAST(levenshtein(header, canonical) AS BIGINT) AS distance,
       |    row_number() OVER (PARTITION BY header
       |      ORDER BY levenshtein(header, canonical), canonical) AS rk
       |  FROM incoming CROSS JOIN canon)
       |SELECT header, canonical AS mapped_to, distance, distance <= 3 AS accepted
       |FROM scored WHERE rk = 1 ORDER BY header""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("etl_header_map", etlHeaderMap _, etlHeaderMapSql))
}
