package graft.queries

import graft.Tables
import graft.functions.VecFns
import graft.operators.TopK
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 wave P — retrieval-ranking evaluation: NDCG@10, mean
  * reciprocal rank, and reciprocal-rank fusion over the embedding
  * corpus. The query set derives in-plan (min vec_id per label), the
  * relevance labels derive from cluster labels, and every ranking is
  * totally ordered (score desc, vec_id) — so both engines replay the
  * exact permutation and the gates hash-match.
  *
  * Scale design: queries broadcast and scoring stays map-side (the
  * ann_bruteforce shape — the scored N×Q set never shuffles wholesale);
  * per-query rankings materialize only through bounded TopK heaps
  * (NDCG@10, RRF cutoff 100). MRR avoids ranking entirely: the rank of
  * the FIRST relevant neighbor is computed by max_by + a count of
  * strictly-better rows — two aggregates, no data-cardinality window.
  */
object RankQ {

  /** All (query, candidate) cosine pairs: queries = min vec_id per
    * label, candidates = every other vector. Map-side after a
    * broadcast of the ≤ label-cardinality query set.
    */
  private def scored(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, dir).embeddings
    val q = e.groupBy($"label".as("q_label")).agg(min($"vec_id").as("q_id"))
      .join(e.select($"vec_id".as("q_id"), $"embedding".as("q_v")), "q_id")
    e.crossJoin(broadcast(q))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"q_label", $"vec_id", $"label",
        VecFns.cosine($"embedding", $"q_v").as("cos"))
  }

  private val scoredSql =
    """q AS (
      |  SELECT l.q_label, l.q_id, CAST(e.embedding AS DOUBLE[]) AS q_v
      |  FROM (SELECT label AS q_label, min(vec_id) AS q_id
      |        FROM embeddings GROUP BY label) l
      |  JOIN embeddings e ON e.vec_id = l.q_id),
      |scored AS (
      |  SELECT q.q_id, q.q_label, e.vec_id, e.label,
      |    list_dot_product(CAST(e.embedding AS DOUBLE[]), q_v) /
      |      (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
      |       sqrt(list_dot_product(q_v, q_v))) AS cos
      |  FROM embeddings e, q WHERE e.vec_id <> q.q_id)""".stripMargin

  // --------------------------------------------------------------- q_ndcg
  /** NDCG@10 per query with graded relevance from cluster labels
    * (3 = same label, 1 = adjacent label, 0 = else): DCG over the
    * cosine top-10, ideal DCG over the relevance-sorted top-10 — both
    * rankings bounded TopK heaps, DCG terms nano-quantized. The
    * cross-query mean aggregates e6-quantized per-query ratios.
    */
  def qNdcg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val s = scored(spark, dir).withColumn("rel", expr(
      "CASE WHEN label = q_label THEN 3 WHEN abs(label - q_label) = 1 THEN 1 ELSE 0 END"))
    val dcg = TopK(s, Seq($"q_id"), Seq($"cos".desc, $"vec_id"), 10)
      .select($"q_id", $"q_label", expr(
        "CAST(round(1e9 * (pow(2.0, rel) - 1.0) / log2(CAST(rk + 1 AS DOUBLE))) AS BIGINT)")
        .as("t"))
      .groupBy($"q_id", $"q_label").agg(sum($"t").as("dcg_e9"))
    val idcg = TopK(s, Seq($"q_id"), Seq($"rel".desc, $"vec_id"), 10)
      .select($"q_id", expr(
        "CAST(round(1e9 * (pow(2.0, rel) - 1.0) / log2(CAST(rk + 1 AS DOUBLE))) AS BIGINT)")
        .as("t"))
      .groupBy($"q_id").agg(sum($"t").as("idcg_e9"))
    val per = dcg.join(idcg, "q_id")
      .withColumn("nd_e6",
        expr("CAST(round(1e6 * dcg_e9 / idcg_e9) AS BIGINT)"))
    val mean = per.agg(sum($"nd_e6").as("se6"), count(lit(1)).as("nq"))
    per.crossJoin(broadcast(mean))
      .select($"q_id", $"q_label",
        expr("round(dcg_e9 / 1e9, 6)").as("dcg"),
        expr("round(idcg_e9 / 1e9, 6)").as("idcg"),
        expr("round(nd_e6 / 1e6, 6)").as("ndcg"),
        expr("round(se6 / 1e6 / nq, 6)").as("mean_ndcg"))
      .orderBy($"q_id")
  }

  private val qNdcgSql =
    s"""WITH $scoredSql,
       |s AS (
       |  SELECT *, CASE WHEN label = q_label THEN 3
       |    WHEN abs(label - q_label) = 1 THEN 1 ELSE 0 END AS rel
       |  FROM scored),
       |byc AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk FROM s),
       |byr AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY rel DESC, vec_id) AS rk FROM s),
       |dcg AS (
       |  SELECT q_id, q_label,
       |    CAST(sum(CAST(round(1e9 * (pow(2.0, rel) - 1.0) / log2(CAST(rk + 1 AS DOUBLE))) AS BIGINT)) AS BIGINT) AS dcg_e9
       |  FROM byc WHERE rk <= 10 GROUP BY q_id, q_label),
       |idcg AS (
       |  SELECT q_id,
       |    CAST(sum(CAST(round(1e9 * (pow(2.0, rel) - 1.0) / log2(CAST(rk + 1 AS DOUBLE))) AS BIGINT)) AS BIGINT) AS idcg_e9
       |  FROM byr WHERE rk <= 10 GROUP BY q_id),
       |per AS (
       |  SELECT d.q_id, d.q_label, dcg_e9, idcg_e9,
       |    CAST(round(1e6 * dcg_e9 / idcg_e9) AS BIGINT) AS nd_e6
       |  FROM dcg d JOIN idcg i ON d.q_id = i.q_id),
       |m AS (SELECT CAST(sum(nd_e6) AS BIGINT) AS se6, count(*) AS nq FROM per)
       |SELECT q_id, q_label, round(dcg_e9 / 1e9, 6) AS dcg,
       |  round(idcg_e9 / 1e9, 6) AS idcg, round(nd_e6 / 1e6, 6) AS ndcg,
       |  round(se6 / 1e6 / nq, 6) AS mean_ndcg
       |FROM per, m ORDER BY q_id""".stripMargin

  // ---------------------------------------------------------------- q_mrr
  /** Mean reciprocal rank of the first same-label neighbor. The rank
    * is derived WITHOUT ranking the candidate set: the best relevant
    * neighbor per query is one max_by aggregate, and its rank is
    * 1 + count of strictly-better candidates — a second aggregate over
    * the same map-side scored stream. Reciprocal ranks nano-quantize
    * into the cross-query mean.
    */
  def qMrr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val s = scored(spark, dir)
    val best = s.filter($"label" === $"q_label")
      .groupBy($"q_id").agg(max(struct($"cos".as("c"), (-$"vec_id").as("ni"))).as("b"))
      .select($"q_id", $"b.c".as("bcos"), (-$"b.ni").as("bid"))
    val ranked = s.join(broadcast(best), "q_id")
      .groupBy($"q_id")
      .agg((sum(when($"cos" > $"bcos" ||
          ($"cos" === $"bcos" && $"vec_id" < $"bid"), 1L).otherwise(0L)) + 1L)
        .as("first_rank"))
      .withColumn("rr_e9", expr("CAST(round(1e9 / first_rank) AS BIGINT)"))
    val m = ranked.agg(sum($"rr_e9").as("s9"), count(lit(1)).as("nq"))
    ranked.crossJoin(broadcast(m))
      .select($"q_id", $"first_rank",
        expr("round(rr_e9 / 1e9, 6)").as("rr"),
        expr("round(s9 / 1e9 / nq, 6)").as("mrr"))
      .orderBy($"q_id")
  }

  private val qMrrSql =
    s"""WITH $scoredSql,
       |r AS (
       |  SELECT q_id, label, q_label, vec_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
       |  FROM scored),
       |f AS (
       |  SELECT q_id, CAST(min(rn) AS BIGINT) AS first_rank,
       |    CAST(round(1e9 / min(rn)) AS BIGINT) AS rr_e9
       |  FROM r WHERE label = q_label GROUP BY q_id),
       |m AS (SELECT CAST(sum(rr_e9) AS BIGINT) AS s9, count(*) AS nq FROM f)
       |SELECT q_id, first_rank, round(rr_e9 / 1e9, 6) AS rr,
       |  round(s9 / 1e9 / nq, 6) AS mrr
       |FROM f, m ORDER BY q_id""".stripMargin

  // --------------------------------------------------------- q_rrf_fusion
  /** Reciprocal-rank fusion of two rankers for one query (the corpus
    * min vec_id): cosine similarity and euclidean distance, each
    * truncated at rank 100 (the standard RRF cutoff — and what keeps
    * the operator bounded at scale: two TopK heaps, never a global
    * ranking). RRF score = Σ round(1e6/(60 + rank)); fused top-20.
    */
  def qRrfFusion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, dir).embeddings
    val q = e.groupBy().agg(min($"vec_id").as("q_id"))
      .join(e.select($"vec_id".as("q_id"), $"embedding".as("q_v")), "q_id")
    val s = e.crossJoin(broadcast(q))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        VecFns.cosine($"embedding", $"q_v").as("cos"),
        (VecFns.dot($"embedding", $"embedding") + VecFns.dot($"q_v", $"q_v")
          - lit(2.0) * VecFns.dot($"embedding", $"q_v")).as("l2sq"))
    val byCos = TopK(s, Seq($"q_id"), Seq($"cos".desc, $"vec_id"), 100)
      .select($"vec_id", $"rk".cast("long").as("rk_cos"), $"cos")
    val byL2 = TopK(s, Seq($"q_id"), Seq($"l2sq".asc, $"vec_id"), 100)
      .select($"vec_id", $"rk".cast("long").as("rk_l2"))
    byCos.join(byL2, Seq("vec_id"), "full_outer")
      .withColumn("rrf_e6",
        coalesce(expr("CAST(round(1e6 / (60 + rk_cos)) AS BIGINT)"), lit(0L)) +
          coalesce(expr("CAST(round(1e6 / (60 + rk_l2)) AS BIGINT)"), lit(0L)))
      .select($"vec_id", $"rk_cos", $"rk_l2",
        expr("round(rrf_e6 / 1e6, 6)").as("rrf"))
      // rrf is injective in rrf_e6 (exactly-6-decimal fixed point), so
      // this ordering matches the oracle's ORDER BY rrf_e6 DESC
      .orderBy($"rrf".desc, $"vec_id").limit(20)
  }

  private val qRrfFusionSql =
    """WITH q AS (
      |  SELECT e.vec_id AS q_id, CAST(e.embedding AS DOUBLE[]) AS q_v
      |  FROM embeddings e
      |  WHERE e.vec_id = (SELECT min(vec_id) FROM embeddings)),
      |s AS (
      |  SELECT q.q_id, e.vec_id,
      |    list_dot_product(CAST(e.embedding AS DOUBLE[]), q_v) /
      |      (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
      |       sqrt(list_dot_product(q_v, q_v))) AS cos,
      |    list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
      |      + list_dot_product(q_v, q_v)
      |      - 2.0 * list_dot_product(CAST(e.embedding AS DOUBLE[]), q_v) AS l2sq
      |  FROM embeddings e, q WHERE e.vec_id <> q.q_id),
      |bc AS (SELECT vec_id, cos, CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS rk_cos FROM s
      |       QUALIFY rk_cos <= 100),
      |bl AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY l2sq, vec_id) AS BIGINT) AS rk_l2 FROM s
      |       QUALIFY rk_l2 <= 100),
      |f AS (
      |  SELECT coalesce(bc.vec_id, bl.vec_id) AS vec_id, bc.cos, rk_cos, rk_l2,
      |    coalesce(CAST(round(1e6 / (60 + rk_cos)) AS BIGINT), 0) +
      |    coalesce(CAST(round(1e6 / (60 + rk_l2)) AS BIGINT), 0) AS rrf_e6
      |  FROM bc FULL OUTER JOIN bl ON bc.vec_id = bl.vec_id)
      |SELECT vec_id, rk_cos, rk_l2, round(rrf_e6 / 1e6, 6) AS rrf
      |FROM f ORDER BY rrf_e6 DESC, vec_id LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- registry

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("q_ndcg", qNdcg _, qNdcgSql),
    QueryDef.sql("q_mrr", qMrr _, qMrrSql),
    QueryDef.sql("q_rrf_fusion", qRrfFusion _, qRrfFusionSql))
}
