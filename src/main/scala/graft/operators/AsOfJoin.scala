package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY.md §2.2): for each left row, attach the latest
  * right row with `rightTime <= leftTime` on the same key.
  *
  * Spark has no ASOF JOIN operator; a naive range join explodes to
  * O(left × right-per-key). This implementation unions both sides and
  * runs one `last(_, ignoreNulls)` window pass — a single shuffle on
  * the key with an in-partition sort, linear in input size, which is
  * the plan a native as-of operator would execute (sort-merge over
  * the interleaved timeline).
  *
  * Tie semantics: a right row at exactly leftTime matches (inclusive),
  * because right rows sort before left rows at equal timestamps.
  * Callers must pre-deduplicate the right side to one row per
  * (key, time) for deterministic output.
  */
object AsOfJoin {
  /** @param toleranceMicros when >= 0, a match further than this
    *                        before the left time is dropped (nulls) —
    *                        the standard as-of lookback bound.
    */
  def apply(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
            rightPayload: Seq[String], toleranceMicros: Long = -1L): DataFrame = {
    val leftPayload = left.columns.filterNot(c => c == keyCol || c == timeCol).toSeq

    val r = right.select(
      Seq(col(keyCol), col(timeCol), lit(0).as("__src"),
        struct((col(timeCol).as("__t") +: rightPayload.map(col)): _*).as("__asof_in")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l = left.select(
      Seq(col(keyCol), col(timeCol), lit(1).as("__src"),
        lit(null).cast(r.schema("__asof_in").dataType).as("__asof_in")) ++
        leftPayload.map(col): _*)

    val w = Window.partitionBy(keyCol).orderBy(col(timeCol), col("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__asof", last(col("__asof_in"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
    val bounded =
      if (toleranceMicros < 0) matched
      else matched.withColumn("__asof",
        when(unix_micros(col(timeCol)) - unix_micros(col("__asof").getField("__t")) <=
          toleranceMicros, col("__asof")))
    bounded.select(Seq(col(keyCol), col(timeCol)) ++ leftPayload.map(col) ++
      rightPayload.map(p => col("__asof").getField(p).as(p)): _*)
  }
}
