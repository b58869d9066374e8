package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-dup pair graph (SURVEY.md §2.3):
  * assigns every involved doc the minimum doc id of its component —
  * the "keep one per near-dup cluster" step of an LLM data pipeline.
  *
  * Min-label propagation: each iteration joins current labels across
  * edges and takes the elementwise min; converges in O(component
  * diameter) rounds (near-dup clusters are shallow — dozens of rounds
  * would imply a pathological chain). Each round is one shuffle on the
  * edge key; the driver only checks a converged flag (a count), so
  * the loop distributes at 100 TB. `maxIter` bounds the worst case.
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
    while (!converged && iter < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "v2"), col("v") === col("v2"))
        .groupBy(col("u").as("id")).agg(min(col("lbl")).as("nmin"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl"))
        .persist()
      val changed = next.join(labels.withColumnRenamed("lbl", "old"), "id")
        .filter(col("lbl") =!= col("old")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels.withColumnRenamed("lbl", "cluster")
  }
}
