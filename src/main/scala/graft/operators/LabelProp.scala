package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation for community detection — the third
  * iterative graph primitive next to [[PageRank]] and
  * [[ClusterDedup]]'s connected components.
  *
  * Each round every node adopts the most frequent label among its
  * neighbors (ties broken by the SMALLEST label — fully
  * deterministic, so a SQL oracle can replay the rounds verbatim;
  * classic async LPA is run-order-dependent and ungateable). A fixed
  * round count keeps the lineage linear, the q_pagerank pattern.
  *
  * Scale: the undirected edge list persists once and re-serves every
  * round; the label vector (one row per node) is the only update —
  * each round is one shuffle on the neighbor key plus one argmax
  * window over (node, label) counts, never anything quadratic.
  */
object LabelProp {

  /** @param edges (src, dst) pairs, made undirected + deduped here.
    * Returns (node, label) after `rounds` synchronous rounds, labels
    * seeded with each node's own id.
    */
  def run(edges: DataFrame, rounds: Int): DataFrame = {
    // persisted via the ledger: the operator returns a LAZY plan, so
    // release is the caller's move (Verify/Bench clearCache per gate)
    val und = CacheLedger.persist(
      edges.select(col("src").as("u"), col("dst").as("v"))
        .union(edges.select(col("dst"), col("src")))
        .distinct())
    val nodes = und.select(col("u").as("node")).distinct()
    var labels = nodes.select(col("node"), col("node").as("label"))
    for (_ <- 1 to rounds) {
      val counts = und
        .join(labels, und("v") === labels("node"))
        .groupBy(und("u").as("n"), col("label"))
        .agg(count(lit(1)).as("c"))
      val best = counts
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("n")).orderBy(col("c").desc, col("label"))))
        .filter(col("rk") === 1)
        .select(col("n").as("node"), col("label"))
      labels = best.localCheckpoint(eager = false)
    }
    labels
  }
}
