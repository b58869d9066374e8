package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 wave X — spatial analytics: grid-blocked ε-neighbor join
  * and grid-blocked nearest neighbor over a deterministic 2-D point
  * set (md5-derived integer coordinates per customer — synthetic like
  * the corpus URLs, and exactly replayable by the oracle).
  *
  * Scale design: the ε-join is the dedup recipe applied to space —
  * candidates come from a 3×3 grid-cell equi-join (cell edge = ε
  * guarantees zero misses), each point ships to 9 cells and meets
  * only its cell's occupants, never the corpus; verification is an
  * exact integer distance² test. The ORACLE states the quadratic
  * all-pairs definition, so the hash match proves the blocking found
  * exactly the true pair set (the q_skyline pattern). Everything is
  * long arithmetic — no floating point anywhere.
  */
object SpatialQ {

  private val EPS = 5000L // cell edge = ε, micro-units on a 1e6 grid

  /** Deterministic point cloud: one (x, y) per customer. */
  private def points(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).customer.select(
      $"c_custkey".as("id"),
      (conv(substring(md5(concat(lit("gx:"), $"c_custkey".cast("string"))), 1, 13), 16, 10)
        .cast("long") % 1000000L).as("x"),
      (conv(substring(md5(concat(lit("gy:"), $"c_custkey".cast("string"))), 1, 13), 16, 10)
        .cast("long") % 1000000L).as("y"))
  }

  private val pointsSql =
    """pts AS (
      |  SELECT c_custkey AS id,
      |    CAST(('0x' || substr(md5('gx:' || c_custkey), 1, 13)) AS BIGINT) % 1000000 AS x,
      |    CAST(('0x' || substr(md5('gy:' || c_custkey), 1, 13)) AS BIGINT) % 1000000 AS y
      |  FROM customer)""".stripMargin

  // --------------------------------------------------------------- q_grid_join
  /** All point pairs within ε: 3×3 neighbor-cell candidates + exact
    * integer dist² ≤ ε² verify. The oracle is the quadratic
    * definition — hash match ⇒ the grid blocking is lossless.
    */
  def qGridJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pts = points(spark, dir)
    val cells = pts
      .withColumn("cx", expr(s"x div $EPS"))
      .withColumn("cy", expr(s"y div $EPS"))
    val probes = cells
      .withColumn("d", explode(expr(
        "transform(sequence(0, 8), k -> named_struct('dx', k div 3 - 1, 'dy', k % 3 - 1))")))
      .select($"id".as("id_a"), $"x".as("xa"), $"y".as("ya"),
        ($"cx" + $"d.dx").as("cx"), ($"cy" + $"d.dy").as("cy"))
    probes.join(cells.select($"id".as("id_b"), $"x".as("xb"), $"y".as("yb"), $"cx", $"cy"),
        Seq("cx", "cy"))
      .filter($"id_a" < $"id_b")
      .withColumn("dist2",
        ($"xa" - $"xb") * ($"xa" - $"xb") + ($"ya" - $"yb") * ($"ya" - $"yb"))
      .filter($"dist2" <= EPS * EPS)
      // no dedup needed: probe a's 9 distinct neighbor cells meet
      // b's single home cell at most once, and id_a < id_b keeps one
      // orientation — each true pair surfaces exactly once
      .select($"id_a", $"id_b", $"dist2")
      .orderBy($"id_a", $"id_b")
  }

  private val qGridJoinSql =
    s"""WITH $pointsSql
      |SELECT a.id AS id_a, b.id AS id_b,
      |  (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
      |FROM pts a JOIN pts b ON a.id < b.id
      |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= ${EPS * EPS}
      |ORDER BY id_a, id_b""".stripMargin

  // ------------------------------------------------------------ q_spatial_knn
  /** Nearest neighbor within ε per point (grid-bounded NN): same 3×3
    * candidates, min by (dist², id); points with no neighbor inside ε
    * are absent (declared — an unbounded NN needs expanding-ring
    * probes). Deterministic tie-break; pure longs.
    */
  def qSpatialKnn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pts = points(spark, dir)
    val cells = pts
      .withColumn("cx", expr(s"x div $EPS"))
      .withColumn("cy", expr(s"y div $EPS"))
    val probes = cells
      .withColumn("d", explode(expr(
        "transform(sequence(0, 8), k -> named_struct('dx', k div 3 - 1, 'dy', k % 3 - 1))")))
      .select($"id".as("id_a"), $"x".as("xa"), $"y".as("ya"),
        ($"cx" + $"d.dx").as("cx"), ($"cy" + $"d.dy").as("cy"))
    val cand = probes
      .join(cells.select($"id".as("id_b"), $"x".as("xb"), $"y".as("yb"), $"cx", $"cy"),
        Seq("cx", "cy"))
      .filter($"id_a" =!= $"id_b")
      .withColumn("dist2",
        ($"xa" - $"xb") * ($"xa" - $"xb") + ($"ya" - $"yb") * ($"ya" - $"yb"))
      .filter($"dist2" <= EPS * EPS)
    cand.groupBy($"id_a")
      .agg(min(struct($"dist2", $"id_b")).as("m"))
      .select($"id_a", $"m.id_b".as("nn_id"), $"m.dist2".as("dist2"))
      .orderBy($"id_a")
  }

  private val qSpatialKnnSql =
    s"""WITH $pointsSql,
      |cand AS (
      |  SELECT a.id AS id_a, b.id AS id_b,
      |    (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
      |  FROM pts a JOIN pts b ON a.id <> b.id
      |  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= ${EPS * EPS}),
      |r AS (
      |  SELECT id_a, id_b, dist2,
      |    row_number() OVER (PARTITION BY id_a ORDER BY dist2, id_b) AS rn
      |  FROM cand)
      |SELECT id_a, id_b AS nn_id, dist2 FROM r WHERE rn = 1 ORDER BY id_a""".stripMargin

  // ---------------------------------------------------------------- registry

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("q_grid_join", qGridJoin _, qGridJoinSql),
    QueryDef.sql("q_spatial_knn", qSpatialKnn _, qSpatialKnnSql))
}
