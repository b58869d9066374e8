package graft.etl

import graft.sources.Intake
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's whole intake workflow as one callable (SURVEY.md
  * §2.1): enumerate uploads → per-file size + structural validation →
  * canonical-CSV normalization into a session prefix → manifest
  * (streamlit_app.py:215-330 end to end).
  *
  * File-level control flow runs on the driver (it is control flow —
  * the reference iterates uploads the same way); each file's parse,
  * validation and rewrite is a distributed Spark job, so a 100-file ×
  * 1 TB-each drop ingests with full cluster parallelism per file.
  */
object Pipeline {

  final case class FileResult(
      file: String, dest: String, rows: Long, cols: Long,
      issues: Seq[String], accepted: Boolean, uploaded_at_utc: String)

  /** Typed sink reachability: ok or an actionable reason. */
  final case class SinkCheck(ok: Boolean, detail: String)

  /** Preflight the configured sink — the reference's "test S3
    * connection" action with `explain_boto_error`'s
    * provider-error → actionable-message mapping
    * (streamlit_app.py:119-130, 220-228). Writes, reads back and
    * deletes a marker object under the prefix, so every failure a
    * real ingest would hit mid-write (bad URI, unreachable endpoint,
    * no permission) surfaces up front as a typed message instead of
    * a raw Hadoop stack trace.
    */
  def checkSink(spark: SparkSession, cfg: GraftConfig): SinkCheck =
    cfg.sinkUri match {
      case None => SinkCheck(ok = false, "No sink configured (offline mode) — validation runs, nothing is written.")
      case Some(uri) =>
        val marker = new Path(s"$uri/.graft_preflight")
        try {
          val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val out = fs.create(marker, true)
          try out.write("graft".getBytes("UTF-8")) finally out.close()
          val in = fs.open(marker)
          val ok = try { val b = new Array[Byte](5); in.readFully(b); new String(b, "UTF-8") == "graft" }
          finally in.close()
          fs.delete(marker, false)
          if (ok) SinkCheck(ok = true, s"Sink reachable and writable: $uri")
          else SinkCheck(ok = false, s"Sink readback mismatch at $uri — storage may be corrupting writes.")
        } catch {
          case e: java.net.UnknownHostException =>
            SinkCheck(ok = false, s"Sink endpoint unreachable (${e.getMessage}) — check the URI host/region.")
          case e: org.apache.hadoop.security.AccessControlException =>
            SinkCheck(ok = false, s"Access denied to $uri (${e.getMessage}) — check credentials/policy.")
          case _: java.io.FileNotFoundException | _: IllegalArgumentException =>
            SinkCheck(ok = false, s"Sink URI invalid or bucket/path missing: $uri.")
          case e: java.io.IOException =>
            SinkCheck(ok = false, s"Sink I/O failed for $uri: ${e.getMessage}.")
          // object-store connectors throw RuntimeExceptions for
          // credential/endpoint misconfiguration — the probe exists
          // precisely to translate those, so never let one escape
          case scala.util.control.NonFatal(e) =>
            SinkCheck(ok = false,
              s"Sink probe failed for $uri (${e.getClass.getSimpleName}: ${e.getMessage}).")
        }
    }

  /** `uploads/{YYYYMMDD_HHMMSS}_{uuid8}` — the reference's per-session
    * object prefix (`new_session_prefix`, streamlit_app.py:92-94), so
    * two ingest runs into the same `outDir` can never collide or
    * overwrite each other. `ts`/`id` injectable for deterministic tests.
    */
  def sessionPrefix(outDir: String,
                    ts: Option[String] = None, id: Option[String] = None): String = {
    val t = ts.getOrElse(
      java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")))
    val u = id.getOrElse(java.util.UUID.randomUUID.toString.replace("-", "").take(8))
    s"$outDir/uploads/${t}_$u"
  }

  def ingest(spark: SparkSession, inDir: String, outDir: String,
             maxFileMb: Int = 50,
             sessionTs: Option[String] = None,
             sessionId: Option[String] = None): DataFrame =
    ingestWith(spark, inDir, GraftConfig(Some(outDir), maxFileMb), sessionTs, sessionId)

  /** Config-driven intake. OFFLINE mode (no sink configured) still
    * runs every size/structural validation and returns the manifest —
    * the reference's validate-even-when-S3-is-unavailable contract
    * (load_cfg + offline ZIP, streamlit_app.py:37-50,333) — it just
    * writes nothing; `allowXlsx=false` rejects .xlsx uploads with a
    * typed issue like the reference's feature gate.
    */
  def ingestWith(spark: SparkSession, inDir: String, cfg: GraftConfig,
                 sessionTs: Option[String] = None,
                 sessionId: Option[String] = None,
                 clock: () => String = () => java.time.Instant.now().toString): DataFrame = {
    import spark.implicits._
    val session = cfg.sinkUri.map(out => sessionPrefix(out, sessionTs, sessionId))
    val maxFileMb = cfg.maxFileMb
    val inPath = new Path(inDir)
    val fs = inPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(inPath).filter(_.isFile).map(_.getPath)
      .filter(p => p.getName.toLowerCase.endsWith(".csv") ||
        p.getName.toLowerCase.endsWith(".xlsx"))
      .sortBy(_.getName)

    val results = files.map { p =>
      val issues = scala.collection.mutable.ArrayBuffer.empty[String]
      if (!cfg.allowXlsx && p.getName.toLowerCase.endsWith(".xlsx"))
        issues += "XLSX uploads are disabled."
      if (!Validation.fileSizeOk(spark, p.toString, maxFileMb))
        issues += s"File exceeds max size ($maxFileMb MB)."
      var parsed: Option[org.apache.spark.sql.DataFrame] = None
      val df =
        if (issues.nonEmpty) None
        else try {
          val d = Intake.read(spark, p.toString)
          parsed = Some(d)
          // raw header: Spark renames duplicate columns on read
          val headers =
            if (p.getName.toLowerCase.endsWith(".csv"))
              graft.sources.SniffCsv.rawHeader(spark, p.toString)
            else d.columns
          if (headers.exists(_.trim.isEmpty)) issues += "One or more column headers are blank."
          if (headers.distinct.length != headers.length) issues += "Duplicate column headers detected."
          // full-file parse INSIDE the rejection scope: the CSV read
          // is FAILFAST (reference on_bad_lines="error"), but both a
          // limit-1 emptiness probe and a plain count() let the
          // parser skip column materialization (CSV column pruning),
          // silently passing ragged rows. The RDD hop forces every
          // record through the full-width parser — intake is the one
          // place that cost is the point (the reference parses the
          // whole upload too), and it must happen even in offline
          // mode where no write would otherwise touch the rows.
          // Persisted so the canonical-CSV write below reuses the
          // parsed rows instead of re-parsing the file.
          d.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val rows = d.rdd.count()
          if (rows == 0L) issues += "No data rows found."
          Some((d, rows))
        } catch {
          case e: Intake.UnsupportedFormat => issues += e.getMessage; None
          case e: Exception =>
            issues += s"Failed to parse file: ${e.getMessage}"
            parsed.foreach(_.unpersist(blocking = false))
            None
        }
      val stem = p.getName.replaceFirst("\\.[^.]+$", "")
      val dest = session.map(s => s"$s/${stem.replaceAll("[^A-Za-z0-9._-]", "_")}")
      val accepted = issues.isEmpty && df.isDefined
      val (rows, cols) = df.map { case (d, r) =>
        try {
          if (accepted) dest.foreach(Normalize.writeCanonicalCsv(d, _))
          (r, d.columns.length.toLong)
        } finally d.unpersist(blocking = false)
      }.getOrElse((0L, 0L))
      // per-file upload timestamp (reference uploaded_at_utc,
      // streamlit_app.py:308) — clock injectable for deterministic tests
      FileResult(p.getName, if (accepted) dest.getOrElse("") else "",
        rows, cols, issues.toSeq, accepted, clock())
    }

    val manifest = results.toSeq.toDF()
    session.foreach { s =>
      Manifest.writeJson(
        manifest.select($"file", $"dest", $"rows", $"cols", $"accepted", $"uploaded_at_utc"),
        s"$s/manifest")
    }
    manifest
  }
}
