package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source breadth-first search over an undirected edge list —
  * hop-count shortest paths (the reachability/radius primitive next
  * to [[PageRank]] and [[Triangles]] in the graph family).
  *
  * Frontier expansion: each round joins only the CURRENT frontier
  * against the symmetrized edges — work per round is
  * O(edges incident to the frontier), never O(nodes × rounds), and
  * the settled-distance table grows monotonically so a node is
  * expanded exactly once. Every round's frontier is lazily
  * `localCheckpoint`ed (the ClusterDedup lineage rule: persist alone
  * leaves the logical chain growing superlinearly in planning cost,
  * and an executor loss would replay the whole loop).
  */
object Bfs {

  /** @param edges   distinct undirected pairs in `u`/`v` columns
    * @param sources `node` column — distance-0 seeds
    * @param rounds  fixed hop budget; nodes further than this are absent
    */
  def distances(edges: DataFrame, sources: DataFrame, rounds: Int): DataFrame = {
    val sym = edges.select(col("u"), col("v"))
      .unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      .transform(CacheLedger.persist) // probed every round; released by CacheLedger.release()/clearCache
    var dist = sources.select(col("node"), lit(0L).as("dist"))
    var frontier = dist.select(col("node"))
    for (r <- 1 to rounds) {
      val next = frontier.join(sym, frontier("node") === sym("u"))
        .select(col("v").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .withColumn("dist", lit(r.toLong))
        .localCheckpoint(eager = false)
      dist = dist.unionByName(next)
      frontier = next.select(col("node"))
    }
    dist
  }
}
