package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history builder (SURVEY.md §2.1):
  * turn a change stream — one row per (key, version) with the
  * attribute values that became true at that version — into validity
  * intervals `[valid_from, valid_to)` with an `is_current` marker,
  * the standard lake modeling of dimension history (what a warehouse
  * MERGE ... WHEN MATCHED THEN UPDATE SET valid_to=... compiles to).
  *
  * The reference's workflow stops at latest-wins upsert
  * ([[Upsert.latestWins]]); SCD-2 is its history-preserving
  * counterpart. Scale: ONE shuffle on the key columns for the lead()
  * window — per-key change counts are small (bounded by version
  * churn), so partitions stay balanced even when the dimension has
  * billions of keys.
  */
object Scd2 {

  /** `changes`: one row per (key, version). Emits every input row
    * plus `valid_from` (= its version), `valid_to` (= the next
    * version for the same key, null while current) and `is_current`.
    */
  def history(changes: DataFrame, keyCols: Seq[String], versionCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol))
    changes
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
