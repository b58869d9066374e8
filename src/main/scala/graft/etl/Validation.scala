package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative row/table validation (SURVEY.md §2.1) — the reference's
  * discrepancy checks (streamlit_app.py:180-189) as distributed
  * Catalyst predicates instead of pandas driver loops.
  */
object Validation {

  /** A named violation predicate: true ⇒ the row fails this rule. */
  final case class Rule(name: String, violation: Column)

  /** Annotate every row with `issues` (comma-joined failed-rule names,
    * "" when clean — concat_ws skips nulls on both Spark and the
    * DuckDB oracle) and `acceptable`. Pure projection: no shuffle,
    * fully codegen'd, scales with the scan.
    */
  def annotate(df: DataFrame, rules: Seq[Rule]): DataFrame =
    df.withColumn("issues",
        concat_ws(",", rules.map(r => when(r.violation, lit(r.name))): _*))
      .withColumn("acceptable", col("issues") === lit(""))

  /** The reference's max-file-size gate (streamlit_app.py:150-156):
    * total byte size of a path (file or directory) against a cap.
    * Metadata-only — no data scan.
    */
  def fileSizeOk(spark: org.apache.spark.sql.SparkSession, path: String, maxMb: Int): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    bytes <= maxMb.toLong * 1024 * 1024
  }

  /** Table-level structural summary — the reference's per-file checks
    * (rows>0, cols>0, blank/duplicate headers) as a one-row aggregate.
    */
  def tableSummary(df: DataFrame, tableName: String): DataFrame = {
    val headers = df.columns
    val blank = headers.exists(_.trim.isEmpty)
    val dup = headers.distinct.length != headers.length
    df.agg(count(lit(1)).as("n_rows"))
      .select(
        lit(tableName).as("table_name"),
        col("n_rows"),
        lit(headers.length.toLong).as("n_cols"),
        lit(blank).as("blank_headers"),
        lit(dup).as("dup_headers"))
  }
}
