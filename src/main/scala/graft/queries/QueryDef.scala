package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One correctness-gated query: a Spark plan + (when SQL-expressible)
  * a DuckDB oracle over the same parquet tables. `oracle = None` means
  * the driver records a weaker rows-only check (approximate ops).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, fn: (SparkSession, String) => DataFrame, oracle: String): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def rowsOnly(name: String, fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)

  /** Canonical whitespace-tokenizer SQL fragment — the DuckDB twin of
    * [[graft.functions.TextFns.toks]] (lowercase, trim, split on \s+).
    * One definition interpolated into every oracle so the Spark
    * tokenizer and the oracle tokenizer can never drift apart.
    */
  def toksSql(col: String = "text"): String =
    s"string_split_regex(lower(trim($col)),'\\s+')"
}
