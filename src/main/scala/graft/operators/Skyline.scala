package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed skyline (Pareto frontier) — minimize `xCol`, maximize
  * `yCol`. The naive formulation is a quadratic NOT-EXISTS self-join;
  * the sorted formulation is linear: ordered by (x asc, y desc), a
  * point is on the skyline iff its y strictly exceeds the running max
  * of y over all earlier points (every dominator sorts earlier, and
  * an earlier point with y ≥ current dominates it). That window has
  * no partition key, so run alone it would serialize the whole input
  * through one task — instead the skyline's distributivity
  * (skyline(S) = skyline(∪ skyline(partᵢ))) gives a two-stage plan:
  * a salted local pass prunes each partition to its own frontier
  * map-side, and only those survivors — typically a tiny fraction —
  * reach the single-task global pass. The same shape as partial
  * aggregation: the unbounded-input stage is parallel, the serial
  * stage sees bounded data.
  */
object Skyline {

  /** One sorted-window skyline pass within each `parts` group
    * (global when `parts` is empty). Expects distinct (x, y) points —
    * [[pareto]] guarantees that via its pre-aggregation.
    */
  private def paretoPass(df: DataFrame, xCol: String, yCol: String,
                         parts: Seq[String]): DataFrame = {
    val w = Window.partitionBy(parts.map(col): _*)
      .orderBy(col(xCol).asc, col(yCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("_ymax", max(col(yCol)).over(w))
      .filter(col("_ymax").isNull || col("_ymax") < col(yCol))
      .drop("_ymax")
  }

  /** Skyline of `points` under (min x, max y) dominance, carrying a
    * multiplicity count `n_rows` per distinct (x, y). `salts` sizes
    * the parallel local stage.
    */
  def pareto(points: DataFrame, xCol: String, yCol: String,
             salts: Int = 32): DataFrame = {
    val pts = points.groupBy(col(xCol), col(yCol))
      .agg(count(lit(1)).as("n_rows"))
    val salted = pts.withColumn("_salt",
      pmod(hash(col(xCol), col(yCol)), lit(salts)))
    val local = paretoPass(salted, xCol, yCol, Seq("_salt")).drop("_salt")
    paretoPass(local, xCol, yCol, Seq.empty)
  }
}
