package graft.etl

import graft.operators.TopK
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Latest-wins upsert / SCD-1 merge (SURVEY.md §2.1): union base and
  * updates, keep the highest-version row per key. One shuffle on the
  * key — the standard lake-merge shape when no transactional table
  * format is available (a Delta/Iceberg MERGE compiles to the same
  * plan underneath).
  */
object Upsert {

  /** @param versionCol higher wins; ties broken by preferring updates
    *                   (pass a tiebreak column in `versionCol`'s order)
    */
  def latestWins(base: DataFrame, updates: DataFrame,
                 keyCols: Seq[String], versionCol: Column): DataFrame = {
    val unioned = base.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
    TopK(unioned, keyCols.map(col), Seq(versionCol.desc, col("__src").desc), 1,
      rankCol = "__rk")
      .drop("__rk", "__src")
  }
}
