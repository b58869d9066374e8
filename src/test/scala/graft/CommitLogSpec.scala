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

  test("an empty snapshot returns an empty frame, not an exception") {
    val t = tmpTable()
    assert(CommitLog.snapshot(spark, t).count() === 0L)
    val v0 = CommitLog.write(spark, Seq((1L, "a")).toDF("id", "v"), t, overwrite = false)
    // overwrite with an empty frame removes everything from the snapshot
    CommitLog.write(spark, Seq.empty[(Long, String)].toDF("id", "v"), t, overwrite = true)
    assert(CommitLog.snapshot(spark, t).count() === 0L)
    // ...while time travel to v0 still sees the data
    assert(CommitLog.snapshot(spark, t, Some(v0)).count() === 1L)
  }

  test("compaction rewrites many files into few with identical content") {
    val t = tmpTable()
    // three appends → ≥3 data files
    (1 to 3).foreach { i =>
      CommitLog.write(spark, Seq((i.toLong, s"v$i")).toDF("id", "v").repartition(2),
        t, overwrite = false)
    }
    val before = CommitLog.liveFiles(spark, t)
    assert(before.size >= 3)
    val snapBefore = CommitLog.snapshot(spark, t)
      .collect().map(_.toSeq.toList).toSet
    val vC = CommitLog.compact(spark, t)
    val after = CommitLog.liveFiles(spark, t)
    // small table → the degenerate single-file case of the byte-target formula
    assert(after.size === 1)
    assert(after.toSet.intersect(before.toSet).isEmpty)
    // content-identical snapshot (order-independent digest via row set)
    assert(CommitLog.snapshot(spark, t).collect().map(_.toSeq.toList).toSet === snapBefore)
    // time travel to the pre-compaction version still reads the ORIGINAL files
    assert(CommitLog.snapshot(spark, t, Some(vC - 1))
      .collect().map(_.toSeq.toList).toSet === snapBefore)
  }

  test("vacuum deletes only files no retained version references") {
    val t = tmpTable()
    val v0 = CommitLog.write(spark, Seq((1L, "a")).toDF("id", "v"), t, overwrite = false)
    val v1 = CommitLog.write(spark, Seq((2L, "b")).toDF("id", "v"), t, overwrite = true)
    val v2 = CommitLog.write(spark, Seq((3L, "c")).toDF("id", "v"), t, overwrite = false)
    val retainedContent = Seq(v1, v2).map(v =>
      v -> CommitLog.snapshot(spark, t, Some(v)).collect().map(_.toSeq.toList).toSet).toMap
    // keep last 2 versions: v1's live set {fileB} and v2's {fileB,fileC}
    val deleted = CommitLog.vacuum(spark, t, keepVersions = 2)
    // v0's file (removed by the v1 overwrite) is the only unreferenced one
    assert(deleted.size === 1)
    // every retained time-travel read is byte-for-byte intact
    Seq(v1, v2).foreach { v =>
      assert(CommitLog.snapshot(spark, t, Some(v))
        .collect().map(_.toSeq.toList).toSet === retainedContent(v))
    }
    // the expired version's data file is gone from disk
    assert(!new java.io.File(new java.io.File(t).getAbsolutePath)
      .listFiles().map(_.getName).contains(deleted.head))
    // log entries survive as the audit trail
    assert(CommitLog.versions(spark, t) === Seq(v0, v1, v2))
    // a second vacuum is a no-op (idempotent)
    assert(CommitLog.vacuum(spark, t, keepVersions = 2).isEmpty)
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
