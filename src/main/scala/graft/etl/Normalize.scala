package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Canonical normalization (SURVEY.md §2.1) — the reference's
  * `dtype=str` + `fillna("")` + UTF-8 CSV re-emit
  * (streamlit_app.py:164-199), as pure projections.
  */
object Normalize {

  /** Every column to string, nulls to "", values trimmed. */
  def allString(df: DataFrame): DataFrame =
    df.select(df.columns.map(c =>
      coalesce(trim(col(c).cast("string")), lit("")).as(c)): _*)

  /** The reference's SAFE_CHAR_RE: anything outside [A-Za-z0-9._-]
    * becomes '_' (streamlit_app.py:76).
    */
  def sanitize(c: Column): Column =
    regexp_replace(c, "[^A-Za-z0-9._-]", "_")

  /** Sanitize the column names themselves. */
  def sanitizeHeaders(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.replaceAll("[^A-Za-z0-9._-]", "_")): _*)

  /** Canonical UTF-8 CSV emit — the reference's normalize-to-CSV step,
    * distributed (works against any Hadoop URI incl. s3a://).
    */
  def writeCanonicalCsv(df: DataFrame, path: String): Unit =
    allString(df).write.mode("overwrite")
      .option("header", "true").option("encoding", "UTF-8")
      .csv(path)
}
