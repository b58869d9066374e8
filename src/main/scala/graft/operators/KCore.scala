package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round k-core peeling: repeatedly drop nodes of degree < k
  * (and their edges) from an undirected graph — the classic dense-
  * subgraph / community-seed primitive next to [[Triangles]] and
  * [[Bfs]]. Each round is one degree aggregate plus two semi-join
  * prunes of the edge list, all keyed shuffles; the edge list only
  * ever SHRINKS, so per-round cost is monotonically decreasing, and
  * each round's survivor set is lazily localCheckpointed (the
  * ClusterDedup lineage rule). `rounds` bounds the iteration the same
  * way q_pagerank's does — the oracle unrolls the identical rounds;
  * a production run would loop to a converged-flag check instead.
  */
object KCore {

  private def degrees(e: DataFrame): DataFrame =
    e.select(explode(array(col("u"), col("v"))).as("x"))
      .groupBy(col("x")).agg(count(lit(1)).as("d"))

  /** @param edges distinct undirected pairs in `u`/`v` columns
    * @return surviving (node, deg) after `rounds` peels, deg measured
    *         on the surviving edge set
    */
  def peel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    var e = edges.select(col("u"), col("v"))
    for (_ <- 1 to rounds) {
      val keep = degrees(e).filter(col("d") >= k).select(col("x"))
      e = e.join(keep.withColumnRenamed("x", "u"), Seq("u"))
        .join(keep.withColumnRenamed("x", "v"), Seq("v"))
        .select(col("u"), col("v"))
        .localCheckpoint(eager = false)
    }
    degrees(e).select(col("x").as("node"), col("d").as("deg"))
  }
}
