package graft

import graft.etl.Pipeline
import java.nio.file.Files

/** End-to-end reference-workflow parity: mixed-quality upload batch →
  * validated, normalized outputs + manifest.
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
    put("sheet.xlsx", "not really xlsx")

    val manifest = Pipeline.ingest(spark, in.getAbsolutePath, out)
      .collect().map(r => r.getAs[String]("file") ->
        (r.getAs[Boolean]("accepted"), r.getAs[Long]("rows"), r.getAs[Seq[String]]("issues")))
      .toMap

    assert(manifest("good_comma.csv")._1 && manifest("good_comma.csv")._2 == 2)
    assert(manifest("good semi.csv")._1 && manifest("good semi.csv")._2 == 1)
    assert(!manifest("dup_headers.csv")._1 &&
      manifest("dup_headers.csv")._3.exists(_.contains("Duplicate")))
    assert(!manifest("sheet.xlsx")._1)

    // accepted files landed as canonical CSV under sanitized names
    val back = spark.read.option("header", "true").csv(s"$out/good_comma")
    assert(back.count() == 2 && back.columns.toSeq == Seq("a", "b"))
    assert(new java.io.File(s"$out/good_semi").exists())
    // manifest written as JSON
    assert(spark.read.json(s"$out/manifest").count() == 4)
  }
}
