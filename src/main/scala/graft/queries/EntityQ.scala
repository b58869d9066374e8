package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 wave Y — entity resolution end to end: the golden-record
  * pipeline every MDM/CRM consolidation runs, composed from already-
  * gated operators: fuzzy candidate pairs (trigram-blocked
  * Levenshtein, `FuzzyJoin`), an attribute agreement gate, connected
  * components (`ClusterDedup` pointer jumping), and survivorship.
  *
  * Scale design: candidates come from DF-capped trigram blocking
  * (never all-pairs), the attribute gate is two hash joins, the
  * component loop is O(log diameter) shuffles, survivorship is one
  * aggregate. The oracle replays blocking, matching, the recursive
  * min-label walk and survivorship in one statement — the full
  * pipeline hash-matched against an independent engine.
  */
object EntityQ {

  // ------------------------------------------------------------ q_golden_record
  /** Deterministic dirty-duplicate fixture: every customer gains a
    * copy (id + 10⁷) whose name drops one md5-positioned interior
    * character (the `etl_header_map` perturbation recipe) and keeps
    * the balance. Resolution: fuzzy name pairs (Levenshtein ≤ 2 via
    * trigram blocking) that ALSO agree on balance cents (the
    * multi-attribute match rule that stops near-miss names — e.g.
    * "Customer#...123" vs "...124" — from chain-merging distinct
    * entities), then components, then survivorship: the golden
    * record is the min-id member (originals sort below their dirty
    * copies by construction).
    */
  def qGoldenRecord(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables(spark, dir).customer.select(
      $"c_custkey".cast("long").as("id"), $"c_name".as("name"),
      expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"))
    val dirty = c
      .withColumn("p",
        (conv(substring(md5(concat(lit("gr:"), $"name")), 1, 13), 16, 10).cast("long")
          % (length($"name") - 2) + 1).cast("int"))
      .select(($"id" + 10000000L).as("id"),
        expr("concat(substr(name, 1, p), substr(name, p + 2))").as("name"),
        $"cents")
    val all = c.unionByName(dirty)
    // the FuzzyJoin blocking with the agreement attribute IN the
    // blocking key: a match requires equal cents anyway, so blocking
    // on (gram, cents) is LOSSLESS for the match condition and
    // collapses the candidate set to same-balance pairs only
    // (measured 8 s → ~2 s at sf0.1 vs post-filtering)
    val g = all.select($"id", $"name", $"cents",
      explode(expr(
        "array_distinct(transform(sequence(1, length(name) - 2), i -> substring(name, i, 3)))"))
        .as("gram"))
      .transform(graft.operators.CacheLedger.persist)
    val rare = g.join(
      g.groupBy($"gram").agg(count(lit(1)).as("df_"))
        .filter($"df_" <= 200).select($"gram"),
      "gram")
    val matched = rare.as("a").join(rare.as("b"), Seq("gram", "cents"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("a.name").as("s_a"),
        col("b.id").as("id_b"), col("b.name").as("s_b"))
      .distinct()
      .filter(levenshtein($"s_a", $"s_b") <= 2)
      .select($"id_a", $"id_b")
    val comp = graft.operators.ClusterDedup.connectedComponents(matched)
    comp.join(all, "id")
      .groupBy($"cluster")
      .agg(count(lit(1)).as("n_members"),
        min(struct($"id", $"name", $"cents")).as("m"))
      .select($"cluster", $"n_members",
        $"m.id".as("golden_id"), $"m.name".as("golden_name"),
        $"m.cents".as("cents"))
      .orderBy($"cluster")
  }

  private val qGoldenRecordSql =
    """WITH RECURSIVE c AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS id, c_name AS name,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      |  FROM customer),
      |d AS (
      |  SELECT id + 10000000 AS id,
      |    substr(name, 1, CAST(p AS INTEGER)) || substr(name, CAST(p AS INTEGER) + 2) AS name,
      |    cents
      |  FROM (SELECT *,
      |      CAST(('0x' || substr(md5('gr:' || name), 1, 13)) AS BIGINT)
      |        % (length(name) - 2) + 1 AS p
      |    FROM c)),
      |allr AS (SELECT * FROM c UNION ALL SELECT * FROM d),
      |g AS (
      |  SELECT id, name,
      |    unnest(list_distinct([substr(name, i, 3) for i in range(1, length(name) - 1)])) AS gram
      |  FROM allr),
      |dfc AS (SELECT gram, count(*) AS df FROM g GROUP BY gram),
      |rare AS (SELECT g.id, g.name, g.gram FROM g JOIN dfc USING (gram) WHERE df <= 200),
      |cand AS (
      |  SELECT DISTINCT a.id AS id_a, a.name AS na, b.id AS id_b, b.name AS nb
      |  FROM rare a JOIN rare b ON a.gram = b.gram AND a.id < b.id),
      |pairs AS (
      |  SELECT id_a, id_b FROM cand
      |  JOIN allr x ON x.id = cand.id_a JOIN allr y ON y.id = cand.id_b
      |  WHERE levenshtein(na, nb) <= 2 AND x.cents = y.cents),
      |edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
      |nodes AS (SELECT DISTINCT u AS id FROM edges),
      |walk(id, lbl) AS (
      |  SELECT id, id FROM nodes
      |  UNION
      |  SELECT e.u, w.lbl FROM walk w JOIN edges e ON e.v = w.id WHERE w.lbl < e.u),
      |comp AS (SELECT id, min(lbl) AS cluster FROM walk GROUP BY id),
      |j AS (SELECT comp.cluster, allr.id, allr.name, allr.cents
      |      FROM comp JOIN allr USING (id))
      |SELECT cluster, count(*) AS n_members,
      |  min(id) AS golden_id, min_by(name, id) AS golden_name,
      |  min_by(cents, id) AS cents
      |FROM j GROUP BY cluster ORDER BY cluster""".stripMargin

  // ---------------------------------------------------------------- registry

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("q_golden_record", qGoldenRecord _, qGoldenRecordSql))
}
