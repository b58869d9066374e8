package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal lakehouse commit log — the transaction-log pattern behind
  * Delta/Iceberg table formats, dependency-free: a table directory
  * holds immutable parquet data files plus `_log/<version>.json`
  * entries recording which files each version ADDED and REMOVED.
  * Reads never list the data directory (object-store listing is
  * eventually consistent and slow at scale) — a snapshot is the log
  * REPLAY: survivors = ∪adds − ∪removes up to the requested version,
  * which is also what makes TIME TRAVEL free: replay to an older
  * version and read exactly the files that were live then.
  *
  * Writes are append-only and versions are dense integers, so the
  * next version is `last + 1` and a concurrent writer colliding on
  * the same version fails the atomic create (single-writer per
  * version — the optimistic-concurrency primitive real formats build
  * on). Data files are content-addressed UUID names: an overwrite
  * never mutates a file a reader (or an older snapshot) may hold.
  *
  * Scale notes: the log is metadata (bytes per version, not per
  * row); replay is O(versions) driver-side over tiny JSON entries;
  * the data path stays ordinary distributed parquet I/O.
  */
object CommitLog {

  final case class Commit(version: Long, add: Seq[String], remove: Seq[String])

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(tableDir: String) = s"$tableDir/_log"

  private def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }

  /** List committed versions, ascending. */
  def versions(spark: SparkSession, tableDir: String): Seq[Long] = {
    val f = fs(spark, tableDir)
    val p = new org.apache.hadoop.fs.Path(logDir(tableDir))
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".json"))
      .map(n => n.stripSuffix(".json").toLong)
      .sorted
  }

  private def readCommit(spark: SparkSession, tableDir: String, v: Long): Commit = {
    val f = fs(spark, tableDir)
    val in = f.open(new org.apache.hadoop.fs.Path(s"${logDir(tableDir)}/$v.json"))
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    // minimal parser for the writer's own shape: {"version":N,"add":[...],"remove":[...]}
    def arr(key: String): Seq[String] = {
      val m = ("\"" + key + "\"\\s*:\\s*\\[([^\\]]*)\\]").r.findFirstMatchIn(txt)
      m.map(_.group(1)).filter(_.trim.nonEmpty)
        .map(_.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\"")))
        .getOrElse(Seq.empty)
    }
    Commit(v, arr("add"), arr("remove"))
  }

  /** Data-file naming contract. Every name the log ever records is
    * generated internally as `part-<8 hex chars>-<i>.parquet`; the
    * writer ASSERTS it, which is what makes [[readCommit]]'s minimal
    * split-on-comma JSON parser safe — no recorded name can contain a
    * comma, quote, backslash, or bracket, so escaping can never matter
    * on the read path.
    */
  private val FileName = "part-[0-9a-f]{8}-[0-9]+\\.parquet".r

  /** Append a commit for `version`; fails if that version exists
    * (atomic create = the single-writer-per-version guard).
    */
  private def writeCommit(spark: SparkSession, tableDir: String, c: Commit): Unit = {
    (c.add ++ c.remove).foreach(n => require(FileName.matches(n),
      s"commit log file name '$n' violates the part-<batch>-<i>.parquet contract"))
    val f = fs(spark, tableDir)
    f.mkdirs(new org.apache.hadoop.fs.Path(logDir(tableDir)))
    val p = new org.apache.hadoop.fs.Path(s"${logDir(tableDir)}/${c.version}.json")
    val out = f.create(p, false) // no overwrite: concurrent commit loses
    val json = s"""{"version":${c.version},""" +
      s""""add":[${c.add.map(a => "\"" + esc(a) + "\"").mkString(",")}],""" +
      s""""remove":[${c.remove.map(r => "\"" + esc(r) + "\"").mkString(",")}]}"""
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** Live file set at `version` (default: latest). */
  def liveFiles(spark: SparkSession, tableDir: String,
                version: Option[Long] = None): Seq[String] = {
    val vs = versions(spark, tableDir)
    val upTo = version.getOrElse(vs.lastOption.getOrElse(-1L))
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    vs.filter(_ <= upTo).foreach { v =>
      val c = readCommit(spark, tableDir, v)
      live ++= c.add
      live --= c.remove
    }
    live.toSeq
  }

  /** Write `df` as a new version. `overwrite = true` removes every
    * previously-live file from the snapshot (their bytes stay for
    * older versions — time travel); `false` appends.
    */
  def write(spark: SparkSession, df: DataFrame, tableDir: String,
            overwrite: Boolean): Long = {
    val f = fs(spark, tableDir)
    val batch = java.util.UUID.randomUUID().toString.take(8)
    val stage = s"$tableDir/_stage_$batch"
    df.write.parquet(stage)
    val files = f.listStatus(new org.apache.hadoop.fs.Path(stage)).toSeq
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
    // move data files into the table dir under batch-unique names
    val named = files.zipWithIndex.map { case (n, i) => (n, s"part-$batch-$i.parquet") }
    named.foreach { case (from, to) =>
      require(f.rename(new org.apache.hadoop.fs.Path(s"$stage/$from"),
        new org.apache.hadoop.fs.Path(s"$tableDir/$to")), s"rename $from failed")
    }
    f.delete(new org.apache.hadoop.fs.Path(stage), true)
    val prior = liveFiles(spark, tableDir)
    val v = versions(spark, tableDir).lastOption.getOrElse(-1L) + 1
    try writeCommit(spark, tableDir, Commit(v, named.map(_._2),
      if (overwrite) prior else Seq.empty))
    catch { case e: Throwable =>
      // losing the version race must not strand this batch's already-
      // renamed data files in the table dir forever: no commit ever
      // referenced them, so deleting them is safe and keeps the dir =
      // (log-referenced files + in-flight stages) as an invariant.
      named.foreach { case (_, to) =>
        try f.delete(new org.apache.hadoop.fs.Path(s"$tableDir/$to"), false)
        catch { case _: Throwable => () }
      }
      throw e
    }
    v
  }

  /** Compact the current snapshot: rewrite the live data files into
    * `ceil(liveBytes / targetFileBytes)` files (≥ 1) as a NEW version
    * whose commit adds the compacted files and removes every
    * previously-live one. Content is untouched — same rows, fewer
    * files — and the swap is the same single-writer-guarded commit as
    * any write, so readers see the pre- or post-compaction file set,
    * never a mix. Old files stay on disk for time travel until
    * [[vacuum]] retires them.
    *
    * Scale notes: the rewrite is one distributed scan + write sized by
    * data volume; `targetFileBytes` bounds per-task output so a 100 TB
    * table compacts to many right-sized files, not one driver-killer
    * (the N→1 case is just the small-table degenerate of the same
    * formula).
    */
  def compact(spark: SparkSession, tableDir: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    val f = fs(spark, tableDir)
    val live = liveFiles(spark, tableDir)
    require(live.nonEmpty, s"nothing to compact in $tableDir")
    val bytes = live.map(n =>
      f.getFileStatus(new org.apache.hadoop.fs.Path(s"$tableDir/$n")).getLen).sum
    val nOut = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val snap = snapshot(spark, tableDir)
    write(spark, snap.repartition(nOut), tableDir, overwrite = true)
  }

  /** Retention sweep: delete data files not live at ANY of the last
    * `keepVersions` versions, then drop the log entries older than the
    * retention window's replay needs. Time travel to every RETAINED
    * version still reads exactly its original file set (a file live at
    * any retained version is never deleted — the "never delete
    * referenced files" guarantee); versions older than the window
    * become unreadable by construction, which is the same contract as
    * Delta/Iceberg `VACUUM`/`expire_snapshots`.
    *
    * Returns the deleted data-file names. Replay safety: retained
    * versions replay from version 0 over the FULL log (log entries are
    * bytes, not data), so only data files are deleted; log entries are
    * kept — an audit trail costs nothing at metadata scale.
    */
  def vacuum(spark: SparkSession, tableDir: String,
             keepVersions: Int = 2): Seq[String] = {
    require(keepVersions >= 1, "must retain at least the latest version")
    val f = fs(spark, tableDir)
    val vs = versions(spark, tableDir)
    if (vs.isEmpty) return Seq.empty
    val retained = vs.takeRight(keepVersions)
    val referenced = retained
      .flatMap(v => liveFiles(spark, tableDir, Some(v))).toSet
    // every name any commit ever added (the universe of data files the
    // log owns); in-flight _stage_* dirs and the _log dir are not ours
    val everAdded = vs.flatMap(v => readCommit(spark, tableDir, v).add).toSet
    val doomed = (everAdded -- referenced).toSeq.sorted
    // report only what this sweep actually removed — a re-run over an
    // already-vacuumed table is a no-op, not a repeat claim
    doomed.filter { n =>
      val p = new org.apache.hadoop.fs.Path(s"$tableDir/$n")
      try f.exists(p) && f.delete(p, false) catch { case _: Throwable => false }
    }
  }

  /** Snapshot read at `version` (default: latest). An empty snapshot
    * (no versions, or everything removed) returns an empty frame with
    * no schema claim — callers that need a schema read a live one.
    */
  def snapshot(spark: SparkSession, tableDir: String,
               version: Option[Long] = None): DataFrame = {
    val files = liveFiles(spark, tableDir, version).map(n => s"$tableDir/$n")
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files: _*)
  }
}
