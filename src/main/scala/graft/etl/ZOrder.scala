package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional clustering for data-skipping
  * writes (SURVEY.md §2.1). Sorting a table by one column gives
  * perfect min/max pruning on that column and none on any other;
  * interleaving the bits of two columns' bucket values gives a code
  * whose contiguous ranges are small RECTANGLES in (a, b) space — a
  * range-partitioned, sorted-on-write layout then bounds BOTH
  * columns' min/max footer stats per file, so a 100 TB scan filtered
  * on either dimension (or both) skips most row groups. Everything is
  * plain shift/mask arithmetic inside whole-stage codegen, and the
  * oracle replays it with the same integer ops.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` so bit i lands at bit 2i — the
    * classic mask ladder (0x00FF00FF, 0x0F0F0F0F, 0x33333333,
    * 0x55555555), one doubling per step.
    */
  private def spread16(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(65535L))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(16711935L))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(252645135L))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(858993459L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(1431655765L))
  }

  /** 32-bit Morton code of two 16-bit bucket values: a in even bits,
    * b in odd bits. Callers bucket raw values first (e.g. days since
    * an epoch, key mod 2^16) — the code only interleaves.
    */
  def zcode2(a: Column, b: Column): Column =
    spread16(a.cast("long"))
      .bitwiseOR(shiftleft(spread16(b.cast("long")), 1))

  /** The same mask ladder as SQL text, for oracle replay. */
  def spread16Sql(v: String): String = {
    val x0 = s"(($v) & 65535)"
    val x1 = s"(($x0 | ($x0 << 8)) & 16711935)"
    val x2 = s"(($x1 | ($x1 << 4)) & 252645135)"
    val x3 = s"(($x2 | ($x2 << 2)) & 858993459)"
    s"(($x3 | ($x3 << 1)) & 1431655765)"
  }

  def zcode2Sql(a: String, b: String): String =
    s"(${spread16Sql(a)} | (${spread16Sql(b)} << 1))"

  /** Cluster `df` for writing: range-partition on the Morton code of
    * the two bucket columns into `numFiles` contiguous code ranges,
    * sorted within each — every output file covers a small rectangle
    * of (a, b) space. One range-exchange (sampled bounds), no global
    * sort barrier beyond it.
    */
  def cluster(df: DataFrame, a: Column, b: Column, numFiles: Int): DataFrame = {
    val z = zcode2(a, b)
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
  }
}
