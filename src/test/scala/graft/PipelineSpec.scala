package graft

import graft.etl.Pipeline
import java.nio.file.Files

/** End-to-end reference-workflow parity: mixed-quality upload batch →
  * validated, normalized outputs + manifest under an isolated session
  * prefix (reference `new_session_prefix`, streamlit_app.py:92-94).
  */
class PipelineSpec extends GraftSuite {
  import spark.implicits._

  test("ingest validates, normalizes and manifests a mixed upload batch") {
    val in = Files.createTempDirectory("graft_in").toFile
    val out = Files.createTempDirectory("graft_out").toString + "/session"
    def put(name: String, content: String): Unit =
      Files.write(new java.io.File(in, name).toPath, content.getBytes("UTF-8"))

    put("good_comma.csv", "a,b\n1,2\n3,4\n")
    put("good semi.csv", "x;y;z\n5;6;7\n")
    put("dup_headers.csv", "h,h\n1,2\n")
    put("quoted header.csv", "\"last, first\",age\nsmith,1\n")
    put("ragged.csv", "a,b\n1,2\n3,4,5\n")
    put("sheet.xlsx", "not really xlsx")

    val raw = Pipeline.ingestWith(spark, in.getAbsolutePath,
      graft.etl.GraftConfig(Some(out), 50),
      sessionTs = Some("20260101_000000"), sessionId = Some("abcd1234"),
      clock = () => "2026-01-01T00:00:00Z").collect()
    // per-file upload timestamp from the injected clock (reference
    // uploaded_at_utc parity)
    assert(raw.forall(_.getAs[String]("uploaded_at_utc") == "2026-01-01T00:00:00Z"))
    val manifest = raw.map(r => r.getAs[String]("file") ->
        (r.getAs[Boolean]("accepted"), r.getAs[Long]("rows"), r.getAs[Seq[String]]("issues")))
      .toMap

    assert(manifest("good_comma.csv")._1 && manifest("good_comma.csv")._2 == 2)
    assert(manifest("good semi.csv")._1 && manifest("good semi.csv")._2 == 1)
    assert(!manifest("dup_headers.csv")._1 &&
      manifest("dup_headers.csv")._3.exists(_.contains("Duplicate")))
    // quote-aware raw-header parsing: "last, first" is ONE header, not
    // a blank/duplicate pair
    assert(manifest("quoted header.csv")._1,
      s"quoted header rejected: ${manifest("quoted header.csv")._3}")
    // reference on_bad_lines="error" parity: one ragged row rejects
    // the whole file (FAILFAST, not PERMISSIVE null-padding)
    assert(!manifest("ragged.csv")._1 &&
      manifest("ragged.csv")._3.exists(_.startsWith("Failed to parse file")),
      s"ragged CSV not rejected: ${manifest("ragged.csv")._3}")
    assert(!manifest("sheet.xlsx")._1)

    // accepted files landed as canonical CSV under the session prefix
    val session = s"$out/uploads/20260101_000000_abcd1234"
    val back = spark.read.option("header", "true").csv(s"$session/good_comma")
    assert(back.count() == 2 && back.columns.toSeq == Seq("a", "b"))
    assert(new java.io.File(s"$session/good_semi").exists())
    // manifest written as JSON inside the session prefix
    assert(spark.read.json(s"$session/manifest").count() == 6)
  }

  test("sink preflight: typed ok/unavailable instead of raw stack traces") {
    import graft.etl.GraftConfig
    val tmp = Files.createTempDirectory("graft_sink").toString
    val ok = Pipeline.checkSink(spark, GraftConfig(Some(tmp), 50))
    assert(ok.ok, ok.detail)
    // the probe must clean its marker up
    assert(!new java.io.File(tmp, ".graft_preflight").exists())
    val offline = Pipeline.checkSink(spark, GraftConfig(None, 50))
    assert(!offline.ok && offline.detail.contains("offline"))
    val bogus = Pipeline.checkSink(spark, GraftConfig(Some("nosuchscheme://bucket/x"), 50))
    assert(!bogus.ok, "bogus scheme reported reachable")
    assert(!bogus.detail.contains("\tat "), s"stack trace leaked: ${bogus.detail}")
  }

  test("tolerant config: offline mode validates without writing; allowXlsx gates uploads") {
    import graft.etl.GraftConfig
    // missing / blank / malformed settings degrade, never throw
    assert(GraftConfig.load(Map.empty) == GraftConfig(None, 50, allowXlsx = true))
    assert(GraftConfig.load(Map(
      GraftConfig.SinkKey -> "  ", GraftConfig.MaxFileMbKey -> "not-a-number",
      GraftConfig.AllowXlsxKey -> "false")) == GraftConfig(None, 50, allowXlsx = false))

    val in = Files.createTempDirectory("graft_in3").toFile
    val out = Files.createTempDirectory("graft_out3").toString + "/never_created"
    Files.write(new java.io.File(in, "good.csv").toPath, "a,b\n1,2\n".getBytes("UTF-8"))
    Files.write(new java.io.File(in, "bad.csv").toPath, "h,h\n1,2\n".getBytes("UTF-8"))
    val bos = new java.io.ByteArrayOutputStream()
    graft.sources.Xlsx.write(Seq("x"), Seq(Seq("1")), bos)
    Files.write(new java.io.File(in, "sheet.xlsx").toPath, bos.toByteArray)

    // offline + xlsx disabled: full validation, zero writes
    val manifest = Pipeline.ingestWith(spark, in.getAbsolutePath,
      GraftConfig(sinkUri = None, allowXlsx = false))
      .collect().map(r => r.getAs[String]("file") ->
        (r.getAs[Boolean]("accepted"), r.getAs[String]("dest"), r.getAs[Seq[String]]("issues")))
      .toMap
    assert(manifest("good.csv")._1 && manifest("good.csv")._2 == "")
    assert(!manifest("bad.csv")._1 && manifest("bad.csv")._3.exists(_.contains("Duplicate")))
    assert(!manifest("sheet.xlsx")._1 &&
      manifest("sheet.xlsx")._3.exists(_.contains("disabled")))
    assert(!new java.io.File(out).exists(), "offline mode must not write anywhere")

    // same batch with a sink configured: the xlsx is accepted again
    val online = Pipeline.ingestWith(spark, in.getAbsolutePath,
      GraftConfig(sinkUri = Some(out)),
      sessionTs = Some("20260101_000000"), sessionId = Some("cafe0123"))
      .collect().map(r => r.getAs[String]("file") -> r.getAs[Boolean]("accepted")).toMap
    assert(online("good.csv") && online("sheet.xlsx") && !online("bad.csv"))
    assert(new java.io.File(s"$out/uploads/20260101_000000_cafe0123/good").exists())
  }

  test("two ingest runs into the same outDir never collide") {
    val in = Files.createTempDirectory("graft_in2").toFile
    val out = Files.createTempDirectory("graft_out2").toString + "/session"
    Files.write(new java.io.File(in, "t.csv").toPath, "a,b\n1,2\n".getBytes("UTF-8"))

    Pipeline.ingest(spark, in.getAbsolutePath, out,
      sessionTs = Some("20260101_000000"), sessionId = Some("aaaaaaaa"))
    Pipeline.ingest(spark, in.getAbsolutePath, out,
      sessionTs = Some("20260101_000000"), sessionId = Some("bbbbbbbb"))

    val a = s"$out/uploads/20260101_000000_aaaaaaaa/t"
    val b = s"$out/uploads/20260101_000000_bbbbbbbb/t"
    assert(new java.io.File(a).exists() && new java.io.File(b).exists())
    assert(spark.read.option("header", "true").csv(a).count() == 1)
    assert(spark.read.option("header", "true").csv(b).count() == 1)
  }
}
