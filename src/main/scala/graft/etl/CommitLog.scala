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

  /** Append a commit for `version`; fails if that version exists
    * (atomic create = the single-writer-per-version guard).
    */
  private def writeCommit(spark: SparkSession, tableDir: String, c: Commit): Unit = {
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
    writeCommit(spark, tableDir, Commit(v, named.map(_._2),
      if (overwrite) prior else Seq.empty))
    v
  }

  /** Snapshot read at `version` (default: latest). An empty snapshot
    * (no versions, or everything removed) returns an empty frame with
    * no schema claim — callers that need a schema read a live one.
    */
  def snapshot(spark: SparkSession, tableDir: String,
               version: Option[Long] = None): DataFrame = {
    val files = liveFiles(spark, tableDir, version).map(n => s"$tableDir/$n")
    require(files.nonEmpty, s"no live files at version $version in $tableDir")
    spark.read.parquet(files: _*)
  }
}
