package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (SURVEY.md §2.2): rows for the same key
  * whose timestamps are within `gap` belong to one session.
  *
  * One shuffle on the key + in-partition sort; session ids are a
  * running sum over the boundary flags (`lag` + cumulative sum), so
  * state is O(1) per row — the standard scalable formulation. Event
  * tie-break by `ordCol` keeps results deterministic.
  */
object Sessionize {
  def apply(df: DataFrame, keyCol: String, timeCol: String, ordCol: String,
            gapMicros: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(timeCol), col(ordCol))
    val micros = unix_micros(col(timeCol))
    df.withColumn("__prev", lag(micros, 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        (micros - col("__prev")) > gapMicros, 1L).otherwise(0L))
      .withColumn("session_num", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__new")
  }
}
