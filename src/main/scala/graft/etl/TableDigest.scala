package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-independent table content digest — the data-integrity
  * primitive behind "did this copy/migration/compaction preserve the
  * table?": two digests agree iff the row multisets agree (up to
  * 60-bit-hash collision), and comparing them moves ONE ROW per
  * table instead of the table. Each row hashes scan-side to a 60-bit
  * value (first 15 hex of md5 over the '|'-joined, NULL-tagged column
  * strings) and the table digest is the XOR of row hashes — XOR is
  * commutative/associative, so the aggregate is map-side combinable
  * and insensitive to row order, partitioning, and file layout (what
  * makes it usable across two engines, two layouts, or two clusters).
  *
  * Caller contract: pass columns already rendered engine-portably —
  * floats quantized to integer fixed-point, timestamps as epoch
  * integers — because raw float/timestamp→string formatting is not
  * defined cross-engine. XOR's weakness (a row appearing twice
  * cancels out) is why `n_rows` ships alongside; pair-canceling
  * multiset edits that also preserve count are outside the threat
  * model (bit flips, lost files, re-encode drift).
  */
object TableDigest {

  private val NullTag = "null"

  /** 60-bit scan-side row hash over the tagged column renderings. */
  def rowHash(cols: Seq[Column]): Column = {
    val rendered = cols.map(c => coalesce(c.cast("string"), lit(NullTag)))
    conv(substring(md5(concat_ws("|", rendered: _*)), 1, 15), 16, 10).cast("long")
  }

  /** One (table_name, n_rows, xor_digest) row. An empty table digests
    * to 0 (XOR's identity), not NULL — two empty tables must compare
    * equal, and a digest pipeline shouldn't need null-handling.
    */
  def digest(df: DataFrame, tableName: String, cols: Seq[Column]): DataFrame =
    df.select(rowHash(cols).as("__rh"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(expr("bit_xor(__rh)"), lit(0L)).as("xor_digest"))
      .select(lit(tableName).as("table_name"), col("n_rows"), col("xor_digest"))
}
