package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighbor-set Jaccard similarity of vertex pairs — the classic
  * link-prediction / entity-similarity primitive ("users who bought
  * overlapping part sets"). Common-neighbor counting is a wedge
  * enumeration keyed on the MIDDLE vertex: Σ d(w)² candidates, which
  * one web-scale hub turns quadratic. The scale control is the same
  * DF-cap used by `dedup_ngram_jaccard`'s shingle blocking: middles
  * with degree > `maxMiddleDegree` are excluded from candidate
  * GENERATION (a hub that half the graph touches carries no
  * similarity signal — the stopword argument), bounding per-key
  * fan-out at cap² and total wedges at m·cap. The cap is part of the
  * operator's declared semantics and is replayed identically by the
  * oracle, so the gate stays exact.
  *
  * Jaccard = common / (d(u) + d(v) − common) divides two exact
  * integers — both engines produce the identical double, so ranking
  * on it is deterministic with the (u, v) tiebreak.
  */
object NeighborJaccard {

  /** Pairs with ≥ `minCommon` common neighbors over the undirected
    * edge list `edges` (uCol/vCol, deduplicated), with degrees from
    * the FULL graph (the cap only prunes candidate generation).
    */
  def pairs(edges: DataFrame, uCol: String, vCol: String,
      minCommon: Int = 2, maxMiddleDegree: Int = 64): DataFrame = {
    val e = edges.select(col(uCol).as("u"), col(vCol).as("v"))
    val adj = e.select(col("u").as("w"), col("v").as("n"))
      .unionByName(e.select(col("v").as("w"), col("u").as("n")))
    val deg = adj.groupBy(col("n").as("x")).agg(count(lit(1)).as("d"))
    val midOk = adj.join(
      deg.select(col("x").as("w"), col("d").as("dw"))
        .filter(col("dw") <= maxMiddleDegree),
      "w")
    val common = midOk.as("a")
      .join(midOk.as("b"), col("a.w") === col("b.w") && col("a.n") < col("b.n"))
      .groupBy(col("a.n").as("u"), col("b.n").as("v"))
      .agg(count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
    common
      .join(deg.select(col("x").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("d").as("dv")), "v")
      .select(col("u"), col("v"), col("common"),
        col("du"), col("dv"),
        round(col("common") / (col("du") + col("dv") - col("common")), 4)
          .as("jaccard"))
  }
}
