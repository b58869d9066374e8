package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-dup pair graph (SURVEY.md §2.3):
  * assigns every involved doc the minimum doc id of its component —
  * the "keep one per near-dup cluster" step of an LLM data pipeline.
  *
  * Two phases (r12 rework, measured on the golden-record ×100 edge set
  * — 53M edges in ~28k near-clique families):
  *
  * 1. CONTRACTION pre-pass — one traversal of the full edge list maps
  *    every node to the min of its closed neighborhood and keeps only
  *    the surviving cross-label edges (label pairs that still differ),
  *    deduplicated. Dense families — the dominant shape duplicate-heavy
  *    corpora produce — collapse here: a k-clique's C(k,2) edges become
  *    zero or a handful, so the expensive full edge list is touched
  *    ONCE instead of once per iteration. Correctness: every label is a
  *    node of the same component (closed-neighborhood min), the
  *    component min always labels itself, and any component with a
  *    surviving edge keeps its min among the contracted nodes — so
  *    components of the contracted graph map 1:1 onto originals and
  *    composing the two labelings returns the exact min-id labeling.
  *
  * 2. Min-label propagation with pointer jumping over the CONTRACTED
  *    remnant: each iteration (a) takes the elementwise min of neighbor
  *    labels across edges, then (b) jumps `lbl := min(lbl, label(lbl))`
  *    — the label graph halves in depth per round, so convergence is
  *    O(log diameter) shuffles instead of O(diameter). The driver only
  *    checks a converged flag per round (a `limit(1)` count), so the
  *    loop distributes at 100 TB; `maxIter` bounds the worst case.
  *
  * Loop mechanics (r7 rework, measured on the emb_dbscan ε-graph —
  * 7.3k edges, 6 rounds): each round EAGERLY `localCheckpoint`s the
  * new label table — one job materializes the round, lineage is
  * truncated immediately (planning cost stays constant instead of
  * growing with the chain), and the convergence check reads two
  * cached tables. The previous round's checkpoint blocks are freed by
  * the ContextCleaner once dereferenced. Checking EVERY round stops
  * at the first converged round — the earlier every-2nd-round scheme
  * saved one tiny count but ran whole extra join rounds past the
  * fixpoint (85 s → 20 s on the ε-graph, same fixpoint, oracle
  * unchanged).
  */
object ClusterDedup {

  /** @param pairs DataFrame with `id_a` < `id_b` edge columns */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
      .unionByName(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
      .persist()
    // closed-neighborhood min per node — phase 1's labeling, and the
    // node universe of the output (every edge endpoint appears)
    val l = edges.groupBy(col("u"))
      .agg(min(col("v")).as("nmin"))
      .select(col("u").as("id"), least(col("u"), col("nmin")).as("lbl"))
      .localCheckpoint()
    // surviving cross-label edges, re-normalized to id_a < id_b — for a
    // near-clique family this is empty or tiny; for a path it shrinks
    // by a constant factor and phase 2's jumping does the log work
    // shuffle_hash on the label side (r15): the edge list is the big
    // relation here (53M rows on the golden-record ×100 graph vs 3M
    // labels) and a sort-merge join would SORT it twice; hash-building
    // the node-sized label table keeps the edge stream unsorted
    val contracted = edges
      .join(l.select(col("id").as("u"), col("lbl").as("lu")).hint("shuffle_hash"), "u")
      .join(l.select(col("id").as("v"), col("lbl").as("lv")).hint("shuffle_hash"), "v")
      .filter(col("lu") =!= col("lv"))
      .select(least(col("lu"), col("lv")).as("id_a"),
        greatest(col("lu"), col("lv")).as("id_b"))
      .distinct()
    val inner = propagate(contracted, maxIter)
    val out = l
      .join(inner.select(col("id").as("p_id"), col("cluster").as("p_lbl")),
        col("lbl") === col("p_id"), "left")
      .select(col("id"), coalesce(col("p_lbl"), col("lbl")).as("cluster"))
      .localCheckpoint()
    edges.unpersist()
    out
  }

  /** Phase 2: the pointer-jumping min-label loop (the pre-r12 whole
    * algorithm), now fed only the contracted remnant. */
  private def propagate(pairs: DataFrame, maxIter: Int): DataFrame = {
    val edges = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
      .unionByName(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
      .persist()
    // seed labels with least(id, min neighbor) — the same aggregation
    // the plain `distinct` node-list needs anyway, but it pre-runs
    // round 1's propagation for free: every 2-node component (the
    // dominant near-dup shape) is already AT its fixpoint, so the loop
    // runs one confirming round instead of propagate+confirm (r8,
    // measured: one fewer join round per call on every CC gate).
    // Correctness: the seed label is a node id of the same component,
    // the invariant min-label propagation needs.
    var labels = edges.groupBy(col("u"))
      .agg(min(col("v")).as("nmin"))
      .select(col("u").as("id"), least(col("u"), col("nmin")).as("lbl"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // FUSED propagate + pointer jump (r16): the label table itself
      // joins in as extra edges (id → lbl), so one edge-scale join +
      // one aggregate computes min(labels of graph-neighbors ∪
      // {labels(lbl(id))}) — the jump rides the same shuffle instead
      // of two extra node-scale self-joins per round (the r16 probe
      // measured the old 3-join round at 2.4-3.3 s of fixed cost on a
      // 5k-edge remnant; at 100 TB each avoided join is a node-scale
      // shuffle per round). The node's own label is dominated:
      // labels(lbl(id)) ≤ lbl(id) because a min-label table only ever
      // decreases and lbl(id) is a node of the same component — so no
      // least/coalesce re-attach is needed, and every labeled id
      // appears in the output because its label edge feeds the group.
      // Fixpoint and min-id labels are unchanged (every candidate is
      // a same-component node's label; convergence is still checked
      // per round).
      val labelEdges = labels.select(col("id").as("u"), col("lbl").as("v"))
      val next = edges.select(col("u"), col("v")).unionByName(labelEdges)
        .join(labels.withColumnRenamed("id", "v2").hint("shuffle_hash"),
          col("v") === col("v2"))
        .groupBy(col("u").as("id")).agg(min(col("lbl")).as("lbl"))
        .localCheckpoint() // eager: materialize + truncate
      val changed = next.join(labels.withColumnRenamed("lbl", "old"), "id")
        .filter(col("lbl") =!= col("old")).limit(1).count()
      labels = next // previous checkpoint blocks freed by ContextCleaner
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    labels.withColumnRenamed("lbl", "cluster")
  }
}
