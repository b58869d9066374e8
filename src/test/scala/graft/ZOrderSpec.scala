package graft

import java.nio.file.Files

import graft.etl.ZOrder
import org.apache.spark.sql.functions._

class ZOrderSpec extends GraftSuite {
  import spark.implicits._

  test("zcode2 interleaves bits exactly (reference bit loop)") {
    def spread(x: Long): Long =
      (0 until 16).map(i => ((x >> i) & 1L) << (2 * i)).sum
    val in = Seq((3L, 5L), (65535L, 0L), (0L, 65535L), (12345L, 54321L))
    val got = in.toDF("a", "b").select(ZOrder.zcode2($"a", $"b")).as[Long].collect().toSeq
    val exp = in.map { case (a, b) => spread(a) | (spread(b) << 1) }
    assert(got == exp)
  }

  test("z-order layout bounds BOTH dimensions per file; linear sort only one") {
    // 256x256 uniform grid: a = id % 256, b = id / 256
    val grid = spark.range(256L * 256L)
      .select(($"id" % 256).as("a"), ($"id" / 256).cast("long").as("b"))

    def spans(path: String): (Double, Double, Long) = {
      val byFile = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max($"a") - min($"a")).as("sa"), (max($"b") - min($"b")).as("sb"))
      val r = byFile.agg(avg($"sa"), avg($"sb")).collect().head
      // pruning probe: how many files contain b == 7?
      val hit = spark.read.parquet(path).filter($"b" === 7)
        .select(input_file_name()).distinct().count()
      (r.getDouble(0), r.getDouble(1), hit)
    }

    val zDir = Files.createTempDirectory("graft_z").toString + "/z"
    ZOrder.cluster(grid, $"a", $"b", numFiles = 16).write.parquet(zDir)
    val (za, zb, zHit) = spans(zDir)

    val lDir = Files.createTempDirectory("graft_z").toString + "/linear"
    grid.repartitionByRange(16, $"a").sortWithinPartitions($"a").write.parquet(lDir)
    val (la, lb, lHit) = spans(lDir)

    info(f"zorder spans a=$za%.0f b=$zb%.0f files(b=7)=$zHit; linear a=$la%.0f b=$lb%.0f files(b=7)=$lHit")
    // z-order: both dims bounded well below the 255 global span (the
    // sampled range bounds cut z-space at ragged points, so files are
    // near-rectangles, not exact 4x4 cells)
    assert(za < 140 && zb < 140, s"zorder spans not rectangular: $za / $zb")
    // linear: the sorted dim is tight but the other spans ~everything
    assert(la < 32 && lb > 200)
    // data skipping on the non-sorted dim: z-order confines b==7 to a
    // minority of files; the linear layout has it in every file
    assert(zHit <= 8 && lHit >= 12, s"pruning probe: $zHit vs $lHit")
  }
}
