package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sums (running totals over a global ordering).
  *
  * A naive `Window.orderBy(x)` with no partition key funnels the whole
  * table through ONE task — the classic single-partition window
  * scale-killer. This operator keeps the global-order semantics but
  * executes in parallel with the two-pass bucket-offset scheme every
  * distributed sort engine uses:
  *
  *   1. assign each row a coarse ORDER-PRESERVING bucket (caller
  *      supplies the expression — e.g. `floor(value)` for a bounded
  *      numeric, a date for a time series);
  *   2. aggregate per-bucket totals (rows = #buckets, tiny) and
  *      prefix-sum THOSE on a single partition — the plan-serially,
  *      execute-parallel shape: the serial pass touches aggregated
  *      metadata only, never the data;
  *   3. broadcast the per-bucket starting offsets back and run the
  *      within-bucket window partitioned BY bucket — full parallelism.
  *
  * The result equals `sum(col) OVER (ORDER BY orderCol ROWS UNBOUNDED
  * PRECEDING)` for every row, provided `bucket` is monotone in
  * `orderCol` and rows are unique per `orderCol` value (callers
  * pre-aggregate to distinct order keys, as the KS gate does).
  */
object PrefixSum {

  /** Appends `cum_<name>` columns: running totals of each summed
    * column over the global `orderCol` ordering.
    */
  def running(df: DataFrame, orderCol: Column, bucket: Column,
              sumCols: Seq[(String, Column)]): DataFrame = {
    val b = df.withColumn("__bucket", bucket)
    val totals = b.groupBy(col("__bucket"))
      .agg(sum(sumCols.head._2).as("__t0"),
        sumCols.drop(1).zipWithIndex.map { case ((_, c), i) =>
          sum(c).as(s"__t${i + 1}")
        }: _*)
    // Serial pass over #buckets rows of aggregated totals only.
    val wOff = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = totals.select(
      col("__bucket") +: sumCols.indices.map { i =>
        coalesce(sum(col(s"__t$i")).over(wOff), lit(0L)).as(s"__off$i")
      }: _*)
    val w = Window.partitionBy(col("__bucket")).orderBy(orderCol)
    val cum = sumCols.zipWithIndex.foldLeft(b.join(broadcast(off), "__bucket")) {
      case (acc, ((name, c), i)) =>
        acc.withColumn(s"cum_$name", col(s"__off$i") + sum(c).over(w))
    }
    cum.drop("__bucket" +: sumCols.indices.map(i => s"__off$i"): _*)
  }

  /** Appends `runmax_<name>`: the running MAXIMUM of `maxCol` over
    * the global `orderCol` ordering (inclusive of the current row) —
    * same bucket-offset two-pass as [[running]], with max as the
    * (also associative) combine. The serial pass again touches only
    * per-bucket maxima.
    */
  def runningMax(df: DataFrame, orderCol: Column, bucket: Column,
                 name: String, maxCol: Column): DataFrame = {
    val b = df.withColumn("__bucket", bucket)
    val totals = b.groupBy(col("__bucket")).agg(max(maxCol).as("__m"))
    val wOff = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = totals.select(col("__bucket"),
      max(col("__m")).over(wOff).as("__moff"))
    val w = Window.partitionBy(col("__bucket")).orderBy(orderCol)
    b.join(broadcast(off), "__bucket")
      .withColumn(s"runmax_$name",
        greatest(coalesce(col("__moff"), max(maxCol).over(w)),
          max(maxCol).over(w)))
      .drop("__bucket", "__moff")
  }
}
