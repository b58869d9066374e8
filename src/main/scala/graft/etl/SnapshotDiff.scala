package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data capture between two snapshots of the same table: a
  * single full-outer join on the key classifies every row as
  * inserted / deleted / changed / unchanged. Attribute comparison is
  * a narrow md5 over the row's JSON form, computed scan-side on each
  * snapshot — the join carries
  * (key, 32-char digest), not the full row width, which is the
  * difference between shipping 2×100 TB and 2×key-set through the
  * shuffle.
  */
object SnapshotDiff {

  // Digest over the JSON form of the row struct: injective across
  // column boundaries (fields are quoted and named, so no separator
  // can be forged by data) and across NULL vs any string sentinel
  // (JSON omits null fields entirely).
  private def rowDigest(cols: Seq[String]) =
    md5(to_json(struct(cols.map(col): _*)))

  /** One row per key present in either snapshot, with `status` in
    * {inserted, deleted, changed, unchanged}.
    */
  def diff(base: DataFrame, current: DataFrame,
           keyCol: String, compareCols: Seq[String]): DataFrame = {
    val b = base.select(col(keyCol).as("__key"), rowDigest(compareCols).as("__bh"))
    val c = current.select(col(keyCol).as("__key"), rowDigest(compareCols).as("__ch"))
    b.join(c, Seq("__key"), "full_outer")
      .select(col("__key").as(keyCol),
        when(col("__bh").isNull, "inserted")
          .when(col("__ch").isNull, "deleted")
          .when(col("__bh") =!= col("__ch"), "changed")
          .otherwise("unchanged").as("status"))
  }
}
