package graft

import graft.etl.CommitLog

/** Minimal lakehouse commit log (etl/CommitLog.scala): log-replay
  * snapshots, time travel, append vs overwrite, single-writer guard.
  */
class CommitLogSpec extends GraftSuite {
  import spark.implicits._

  private def tmpTable(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_log").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/t"
  }

  test("append and overwrite versions replay to the right snapshots") {
    val t = tmpTable()
    val v0 = CommitLog.write(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t, overwrite = false)
    val v1 = CommitLog.write(spark, Seq((3L, "c")).toDF("id", "v"), t, overwrite = false)
    val v2 = CommitLog.write(spark, Seq((9L, "z")).toDF("id", "v"), t, overwrite = true)
    assert((v0, v1, v2) === ((0L, 1L, 2L)))
    def ids(v: Long): Set[Long] =
      CommitLog.snapshot(spark, t, Some(v)).select("id").as[Long].collect().toSet
    assert(ids(0L) === Set(1L, 2L))
    assert(ids(1L) === Set(1L, 2L, 3L))
    assert(ids(2L) === Set(9L))
    // latest = v2
    assert(CommitLog.snapshot(spark, t).select("id").as[Long].collect().toSet === Set(9L))
    // time travel is STABLE after the overwrite: old bytes never mutated
    assert(ids(0L) === Set(1L, 2L))
    assert(CommitLog.versions(spark, t) === Seq(0L, 1L, 2L))
  }

  test("snapshots never list the data directory: stray files are invisible") {
    val t = tmpTable()
    CommitLog.write(spark, Seq((1L, "a")).toDF("id", "v"), t, overwrite = false)
    // plant an uncommitted parquet file in the table dir
    Seq((99L, "stray")).toDF("id", "v").write.parquet(t + "_stray")
    val stray = new java.io.File(t + "_stray").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(stray.toPath,
      new java.io.File(t, "part-stray-0.parquet").toPath)
    assert(CommitLog.snapshot(spark, t).select("id").as[Long].collect().toSet === Set(1L))
  }

  test("change data feed between versions composes with SnapshotDiff") {
    val t = tmpTable()
    CommitLog.write(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), t, overwrite = false)
    CommitLog.write(spark,
      Seq((2L, "B"), (3L, "c"), (4L, "d")).toDF("id", "v"), t, overwrite = true)
    val cdc = graft.etl.SnapshotDiff.diff(
      CommitLog.snapshot(spark, t, Some(0L)),
      CommitLog.snapshot(spark, t, Some(1L)),
      "id", Seq("v"))
    val byId = cdc.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId === Map(1L -> "deleted", 2L -> "changed", 3L -> "unchanged", 4L -> "inserted"))
  }

  test("a colliding version number fails the atomic log create") {
    val t = tmpTable()
    CommitLog.write(spark, Seq((1L, "a")).toDF("id", "v"), t, overwrite = false)
    // simulate a concurrent writer racing on version 1: first wins...
    CommitLog.write(spark, Seq((2L, "b")).toDF("id", "v"), t, overwrite = false)
    // ...and a stale writer that computed the same next version loses
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    intercept[Exception] {
      fs.create(new org.apache.hadoop.fs.Path(s"$t/_log/1.json"), false)
    }
  }
}
