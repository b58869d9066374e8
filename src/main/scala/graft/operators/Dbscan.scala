package graft.operators

import graft.functions.VecFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Density-based clustering (DBSCAN) over an embedding column —
  * the "find the dense semantic neighborhoods, flag the stragglers"
  * operator of a corpus-curation pipeline (cf. reference
  * FREE-ETL's clustering utilities; see SURVEY.md §2.4).
  *
  * The classic algorithm needs every ε-neighbor of every point — an
  * all-pairs scan. Here the neighbor graph is generated through the
  * same deterministic hyperplane-bucket equi-join as
  * [[Similarity.knnJoin]]: each vector lands in one sign-pattern
  * bucket, probes its own bucket plus all 1-bit flips, and only
  * bucket-colliding pairs are scored. That bounds candidates at
  * O(n²/2^planes) per bucket instead of O(n²) corpus-wide, shuffles
  * on the bucket key (no broadcast of anything unbounded), and the
  * md5-derived planes make the candidate set — and therefore the
  * whole published clustering — exactly replayable by a SQL oracle.
  * The ε-graph is "neighbors among hash-colliding pairs": the
  * blocking is part of the published algorithm, the FuzzyJoin
  * contract.
  *
  * Roles follow standard DBSCAN with the neighbor count EXCLUDING
  * the point itself: core = ≥ minPts neighbors at cosine ≥ minCos;
  * clusters = connected components over core–core edges (min-label,
  * via [[ClusterDedup.connectedComponents]] — O(log diameter)
  * pointer-jumping rounds, bounded driver state); border = non-core
  * with ≥1 core neighbor, adopting the smallest core cluster label;
  * everything else is noise (cluster −1).
  */
object Dbscan {

  private def planeSig(vecCol: String, planes: Int): Column =
    element_at(graft.functions.HyperplaneBands(col(vecCol), 1, planes), 1)

  /** Unordered candidate pairs (id_a < id_b) with cosine ≥ minCos.
    * Bucket hamming distance ≤ 1 is symmetric, so each colliding
    * pair appears exactly once per direction and the `<` filter
    * keeps exactly one row — no dedup pass needed.
    */
  def epsPairs(vectors: DataFrame, idCol: String, vecCol: String,
               minCos: Double, planes: Int = 4): DataFrame = {
    val v = vectors.select(col(idCol).as("id"), col(vecCol).as("v"),
      VecFns.norm(col(vecCol)).as("nrm"),
      planeSig(vecCol, planes).as("bucket"))
      .transform(CacheLedger.persist) // both join sides; released via CacheLedger.release()/clearCache
    val probes = v
      .select(col("id").as("q_id"), col("v").as("q_v"),
        col("nrm").as("q_nrm"), col("bucket").as("q_bucket"))
      .withColumn("bucket", explode(expr(
        s"array_union(array(q_bucket), transform(sequence(0, ${planes - 1}), p -> " +
          "CAST(q_bucket AS BIGINT) ^ shiftleft(CAST(1 AS BIGINT), p)))")))
      .select(col("q_id"), col("q_v"), col("q_nrm"), col("bucket"))
    v.join(probes, "bucket") // no hint: both sides corpus-sized
      .filter(col("q_id") < col("id"))
      .withColumn("cos", VecFns.cosinePrenormed(
        VecFns.dot(col("v"), col("q_v")), col("nrm"), col("q_nrm")))
      .filter(col("cos") >= minCos)
      .select(col("q_id").as("id_a"), col("id").as("id_b"))
  }

  /** Full DBSCAN assignment: one row per input vector with
    * `role` ∈ {core, border, noise} and `cluster` (−1 for noise).
    */
  def fit(vectors: DataFrame, idCol: String, vecCol: String,
          minCos: Double, minPts: Int, planes: Int = 4): DataFrame = {
    val pairs = epsPairs(vectors, idCol, vecCol, minCos, planes)
      .transform(CacheLedger.persist) // read by degrees, core edges and border attach
    val neighbors = pairs.select(col("id_a").as("id"), col("id_b").as("nb"))
      .unionByName(pairs.select(col("id_b").as("id"), col("id_a").as("nb")))
    val degrees = neighbors.groupBy("id").agg(count(lit(1)).as("deg"))
    val cores = degrees.filter(col("deg") >= minPts).select(col("id"))
      .transform(CacheLedger.persist) // three consumers below
    val coreEdges = pairs
      .join(cores.withColumnRenamed("id", "id_a"), "id_a")
      .join(cores.withColumnRenamed("id", "id_b"), "id_b")
      .select(col("id_a"), col("id_b"))
    // components over core–core edges; isolated cores keep their own id
    val comp = ClusterDedup.connectedComponents(coreEdges)
    val coreOut = cores.join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"),
        lit("core").as("role"))
      .transform(CacheLedger.persist) // border attach + final union read it
    val borderOut = neighbors
      .join(coreOut.select(col("id").as("nb"), col("cluster")), "nb")
      .join(cores.withColumnRenamed("id", "nb2"), col("id") === col("nb2"), "left_anti")
      .groupBy("id").agg(min(col("cluster")).as("cluster"))
      .withColumn("role", lit("border"))
    val assigned = coreOut.unionByName(borderOut)
    vectors.select(col(idCol).as("id"))
      .join(assigned, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("cluster"), lit(-1L)).as("cluster"),
        coalesce(col("role"), lit("noise")).as("role"))
  }
}
