package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Format-dispatching intake (SURVEY.md §2.1) — the Spark face of the
  * reference's upload handler (csv vs xlsx vs unsupported,
  * streamlit_app.py:160-176).
  */
object Intake {
  final case class UnsupportedFormat(msg: String) extends RuntimeException(msg)

  def read(spark: SparkSession, path: String): DataFrame = {
    val lower = path.toLowerCase
    if (lower.endsWith(".csv") || !lower.matches(".*\\.[a-z0-9]+$"))
      SniffCsv.read(spark, path)
    else if (lower.endsWith(".xlsx")) Xlsx.read(spark, path)
    else throw UnsupportedFormat(s"Unsupported file type: $path. Use CSV or XLSX.")
  }
}
