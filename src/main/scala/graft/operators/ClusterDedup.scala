package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-dup pair graph (SURVEY.md §2.3):
  * assigns every involved doc the minimum doc id of its component —
  * the "keep one per near-dup cluster" step of an LLM data pipeline.
  *
  * Min-label propagation with pointer jumping: each iteration (a) takes
  * the elementwise min of neighbor labels across edges, then (b) jumps
  * `lbl := min(lbl, label(lbl))` — the label graph halves in depth per
  * round, so convergence is O(log diameter) shuffles instead of
  * O(diameter) (a 50-deep chain converges in ~7 rounds, not 50).
  * The driver only checks a converged flag per round (a `limit(1)`
  * count), so the loop distributes at 100 TB; `maxIter` bounds the
  * worst case.
  *
  * Lineage control: every third round the label table is
  * `localCheckpoint`ed — persist() alone caches data but the logical
  * plan still chains, and a lost executor at iteration 15 of an
  * unbroken chain would replay the whole loop (plus planning cost
  * grows superlinearly in chain depth).
  */
object ClusterDedup {

  /** @param pairs DataFrame with `id_a` < `id_b` edge columns */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
      .unionByName(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
      .persist()
    var labels = edges.select(col("u").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .persist()
    var iter = 0
    var converged = false
    var labelsCheckpointed = false
    // the previous checkpoint generation: releasable only once the NEXT
    // checkpoint has truncated lineage past it
    var prevCheckpoint: DataFrame = null
    while (!converged && iter < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "v2"), col("v") === col("v2"))
        .groupBy(col("u").as("id")).agg(min(col("lbl")).as("nmin"))
      val propagated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl"))
      // pointer jumping: follow the label's own label (always a node
      // of the same component, so correctness is preserved)
      val jumped = propagated.as("x")
        .join(propagated.select(col("id").as("p_id"), col("lbl").as("p_lbl")).as("y"),
          col("x.lbl") === col("y.p_id"), "left")
        .select(col("x.id").as("id"),
          least(col("x.lbl"), coalesce(col("p_lbl"), col("x.lbl"))).as("lbl"))
      val checkpointThisRound = iter % 3 == 2
      val next =
        // lazy checkpoint: the next convergence count materializes it,
        // so truncation costs no extra pass over the data
        if (checkpointThisRound) jumped.localCheckpoint(eager = false)
        else jumped.persist()
      // convergence check every SECOND round: with pointer jumping the
      // loop is a handful of rounds of tiny shuffles, so driver-side
      // job count — not data — dominates; skipping alternate checks
      // costs at most one extra (cheap) round after convergence
      val shouldCheck = iter % 2 == 1 || iter == maxIter - 1
      val changed =
        if (shouldCheck)
          next.join(labels.withColumnRenamed("lbl", "old"), "id")
            .filter(col("lbl") =!= col("old")).limit(1).count()
        else 1L
      // a checkpointed generation's blocks ARE its lineage — they can
      // only be released after the NEXT checkpoint materializes (just
      // happened via the count above), never while later rounds might
      // still replay through them
      if (!labelsCheckpointed) labels.unpersist()
      if (checkpointThisRound) {
        if (prevCheckpoint != null) prevCheckpoint.unpersist()
        prevCheckpoint = next
      }
      labels = next
      labelsCheckpointed = checkpointThisRound
      converged = changed == 0
      iter += 1
    }
    labels.withColumnRenamed("lbl", "cluster")
  }
}
