package graft.etl

import org.apache.spark.sql.{Column, DataFrame}

/** Lake-layout maintenance (SURVEY.md §2.1): compaction + sort-on-
  * write. Small-file proliferation and unsorted row groups are the
  * two silent killers of 100 TB scan performance — parquet min/max
  * stats only prune when values are clustered, and per-file overhead
  * dominates when files shrink below ~100 MB.
  *
  * `sortedWrite` repartitions to a target file count and sorts within
  * partitions on the clustering key before writing, so each output
  * file covers a narrow key range (the poor man's Z-order for a
  * single dimension).
  */
object Compact {

  def sortedWrite(df: DataFrame, path: String, numFiles: Int, sortCols: Column*): Unit =
    // range-partition (not round-robin) so output files cover DISJOINT
    // key ranges — otherwise every file spans the full range and
    // parquet min/max stats can never prune
    df.repartitionByRange(numFiles, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .write.mode("overwrite").parquet(path)
}
