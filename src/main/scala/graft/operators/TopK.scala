package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group top-k (SURVEY.md §2.2).
  *
  * Implemented as `row_number` over a partitioned window + filter,
  * which Spark executes as a single shuffle on the partition keys with
  * in-partition sort — at 100 TB this is the minimal-movement plan
  * (no global sort, no cross-group interference; AQE handles skewed
  * groups). Callers must pass a total order (include a tie-break
  * column) for deterministic results.
  */
object TopK {
  def apply(df: DataFrame, partitionCols: Seq[Column], order: Seq[Column], k: Int,
            rankCol: String = "rk"): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }
}
