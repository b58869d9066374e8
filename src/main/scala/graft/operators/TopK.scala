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

  /** Native variant: plans through the custom [[graft.plans.GroupTopK]]
    * operator (bounded heap per group, no full per-partition sort —
    * O(n log k) instead of WindowExec's O(n log n) with the whole
    * partition buffered). Requires `GroupTopKStrategy` (injected by
    * `GraftExtensions`, attached in `GraftSession`). Results are
    * identical to `apply` given a total order (spec-asserted).
    */
  def native(df: DataFrame, partitionCols: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, SortOrder}
    import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort}
    // resolve the Columns against df's analyzed plan (ColumnNode
    // wrappers only resolve inside built-in operators)
    val analyzed = df.queryExecution.analyzed
    def resolveExpr(c: Column) =
      df.select(c).queryExecution.analyzed.asInstanceOf[Project]
        .projectList.head match {
          case Alias(e, _) => e
          case e => e
        }
    def resolveSort(c: Column): SortOrder =
      df.sort(c).queryExecution.analyzed.asInstanceOf[Sort].order.head match {
        case s: SortOrder => s
        case e => SortOrder(e, Ascending)
      }
    GraftBridge.ofRows(df.sparkSession,
      graft.plans.GroupTopK(
        partitionCols.map(resolveExpr), order.map(resolveSort), k, analyzed))
  }
}
