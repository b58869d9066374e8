package graft.etl

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingestion manifest (SURVEY.md §2.1) — the reference's
  * `manifest.json` (session, per-file name/rows/cols,
  * streamlit_app.py:313-327) as a DataFrame you can union across an
  * arbitrary table list and sink as JSON next to the data.
  */
object Manifest {

  def build(tables: Tables, names: Seq[String]): DataFrame =
    names.map { n =>
      val df = tables.byName(n)
      df.agg(count(lit(1)).as("n_rows"))
        .select(lit(n).as("table_name"), col("n_rows"),
          lit(df.columns.length.toLong).as("n_cols"))
    }.reduce(_.unionByName(_)).orderBy(col("table_name"))

  /** Session prefix mirroring the reference's `uploads/{ts}_{id8}`
    * (streamlit_app.py:92) — caller supplies the clock/id so plans
    * stay deterministic.
    */
  def sessionPrefix(utcStamp: String, id8: String): String =
    s"uploads/${utcStamp}_$id8"

  def writeJson(manifest: DataFrame, path: String): Unit =
    manifest.coalesce(1).write.mode("overwrite").json(path)
}
