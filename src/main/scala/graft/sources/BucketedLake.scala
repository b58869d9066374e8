package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Self-describing bucketed parquet layout — write once, every reader
  * (any session, any JVM) picks the bucketing back up automatically.
  *
  * Spark's bucketed joins eliminate the exchange on both sides of a
  * fact⋈fact join, but the bucket spec normally lives only in the
  * writing session's catalog: plain `spark.read.parquet` on the same
  * files forgets it, and a fresh JVM re-pays the shuffle the layout
  * already bought. This source closes that gap with a table-format-
  * style metadata file: [[write]] persists the bucket spec as
  * `_graft_buckets.json` INSIDE the data directory (underscore-prefixed,
  * so ordinary parquet readers — Spark, DuckDB, pyarrow — ignore it as
  * a hidden file and read the directory as plain parquet), and [[read]]
  * re-registers an external bucketed table over the existing files in
  * the current session's catalog before handing back `spark.table(...)`.
  * Bucket ids ride in the file names the bucketed writer already
  * produces, so registration is pure metadata — no data rewrite, no
  * listing beyond one existence probe.
  *
  * The 100 TB story: bucketing is the WRITE-TIME knob that amortizes
  * one shuffle across every future join/aggregate on the bucket key
  * (`etl_bucketed_join` pins the no-Exchange plan; the `sf1_bucketed`
  * bench tier measures the dividend on the TPC-H fact joins). A layout
  * decision that evaporates on session restart is not a layout
  * decision — this marker is what makes it durable.
  */
object BucketedLake {

  val MarkerFile = "_graft_buckets.json"
  private val Database = "graft_lake"

  final case class Spec(numBuckets: Int, bucketCols: Seq[String],
                        sortCols: Seq[String], schemaDDL: String)

  /** Write `df` at `path` as a bucketed parquet directory plus the
    * layout marker. The frame is pre-partitioned `numBuckets` ways on
    * the bucket columns with the SAME hash the bucketed writer uses
    * (Murmur3 `HashPartitioning`), so each task holds exactly one
    * bucket and the layout lands as one sorted file per bucket — which
    * is also what lets readers skip the per-partition sort when the
    * sort columns prefix-match the join keys.
    */
  def write(df: DataFrame, path: String, numBuckets: Int,
            bucketCols: Seq[String], sortCols: Seq[String] = Seq.empty): Unit = {
    require(bucketCols.nonEmpty, "bucketed layout needs at least one bucket column")
    require((bucketCols ++ sortCols).forall(c => !c.contains(',') && !c.contains('"')),
      "bucket/sort column names must be comma- and quote-free (marker format)")
    val spark = df.sparkSession
    val tmp = s"$Database.w_${pathTag(path)}"
    val cols = bucketCols.map(org.apache.spark.sql.functions.col)
    val pre = df.repartition(numBuckets, cols: _*)
    val writer0 = pre.write.format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val writer = if (sortCols.nonEmpty)
      writer0.sortBy(sortCols.head, sortCols.tail: _*) else writer0
    this.synchronized {
      spark.sql(s"CREATE DATABASE IF NOT EXISTS $Database")
      spark.sql(s"DROP TABLE IF EXISTS $tmp")
      writer.option("path", path).mode("overwrite").saveAsTable(tmp)
      // external table: DROP releases the catalog name, files stay
      spark.sql(s"DROP TABLE IF EXISTS $tmp")
      // a REWRITE must also invalidate any read-side registration of
      // the same path in this session (ADVICE r12: the stale entry —
      // including Spark's cached relation/file listing and the old
      // bucket spec — kept serving reads until session restart)
      spark.sql(s"DROP TABLE IF EXISTS $Database.t_${pathTag(path)}")
    }
    spark.catalog.refreshByPath(path)
    val json =
      s"""{"version":1,"numBuckets":$numBuckets,
         |"bucketCols":${bucketCols.map(q).mkString("[", ",", "]")},
         |"sortCols":${sortCols.map(q).mkString("[", ",", "]")},
         |"schemaDDL":${q(df.schema.toDDL)}}""".stripMargin.replace("\n", "")
    val marker = new Path(path, MarkerFile)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(marker, true)
    try out.write((json + "\n").getBytes("UTF-8")) finally out.close()
  }

  /** Read `path`: with a layout marker present, through a re-registered
    * external bucketed table (so joins/aggregates on the bucket key
    * skip their exchange); otherwise a plain parquet read. The catalog
    * entry is deterministic per path; a registration created from an
    * EARLIER marker (the path was re-written with a different spec —
    * ADVICE r12) is detected by the marker-content fingerprint stored
    * as a table property and re-registered, so repeat reads of an
    * unchanged layout stay a hashtable hit while a spec change never
    * serves stale metadata.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val marker = new Path(path, MarkerFile)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) return spark.read.parquet(path)
    val raw = readFully(fs, marker)
    val spec = parse(raw)
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(raw.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val tbl = s"$Database.t_${pathTag(path)}"
    this.synchronized {
      spark.sql(s"CREATE DATABASE IF NOT EXISTS $Database")
      val stale = spark.catalog.tableExists(tbl) && {
        val prop = spark.sql(s"SHOW TBLPROPERTIES $tbl ('graft.marker.md5')")
          .collect().headOption.map(_.getString(1)).getOrElse("")
        if (prop == fp) false
        else { spark.sql(s"DROP TABLE IF EXISTS $tbl"); true }
      }
      if (stale || !spark.catalog.tableExists(tbl)) {
        val sorted = if (spec.sortCols.nonEmpty)
          s"SORTED BY (${spec.sortCols.map(bq).mkString(", ")}) " else ""
        spark.sql(
          s"""CREATE TABLE $tbl (${spec.schemaDDL}) USING parquet
             |CLUSTERED BY (${spec.bucketCols.map(bq).mkString(", ")})
             |${sorted}INTO ${spec.numBuckets} BUCKETS
             |LOCATION '$path'
             |TBLPROPERTIES ('graft.marker.md5' = '$fp')""".stripMargin)
        spark.catalog.refreshByPath(path)
      }
    }
    spark.table(tbl)
  }

  /** The layout spec at `path`, if the marker is present — exposed for
    * specs and operator planners that want to know the physical layout
    * without opening a table. */
  def specOf(spark: SparkSession, path: String): Option[Spec] = {
    val marker = new Path(path, MarkerFile)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) Some(parse(readFully(fs, marker))) else None
  }

  /** Deterministic catalog-safe tag per data path: same path → same
    * table name in every session; distinct paths cannot collide (md5). */
  private def pathTag(path: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val base = path.reverse.dropWhile(_ == '/').reverse
      .split('/').last.replaceAll("[^A-Za-z0-9]", "_").take(32)
    s"${base}_$md"
  }

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def bq(c: String): String = s"`${c.replace("`", "``")}`"

  private def readFully(fs: org.apache.hadoop.fs.FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      new String(bos.toByteArray, "UTF-8")
    } finally in.close()
  }

  /** Parse the marker. The writer controls the format exactly (flat
    * JSON object, four known fields, strings escaped by [[q]]), so a
    * field-anchored scan is sufficient and avoids pulling a JSON
    * library into the hot read path. */
  private[graft] def parse(json: String): Spec = {
    def field(name: String): String = {
      val i = json.indexOf("\"" + name + "\":")
      require(i >= 0, s"bucketed-lake marker missing field $name")
      json.substring(i + name.length + 3)
    }
    def str(rest: String): String = {
      // rest starts at a JSON string literal
      require(rest.startsWith("\""), "expected string in bucketed-lake marker")
      val sb = new StringBuilder
      var i = 1
      var done = false
      while (!done) {
        rest.charAt(i) match {
          case '"' => done = true
          case '\\' =>
            rest.charAt(i + 1) match {
              case 'n' => sb.append('\n'); i += 2
              case 'u' =>
                sb.append(Integer.parseInt(rest.substring(i + 2, i + 6), 16).toChar)
                i += 6
              case c => sb.append(c); i += 2
            }
          case c => sb.append(c); i += 1
        }
      }
      sb.toString
    }
    def strList(rest: String): Seq[String] = {
      require(rest.startsWith("["), "expected array in bucketed-lake marker")
      val end = rest.indexOf(']')
      val body = rest.substring(1, end).trim
      if (body.isEmpty) Seq.empty
      else body.split(",").toSeq.map(s => str(s.trim))
    }
    val n = field("numBuckets").takeWhile(_.isDigit).toInt
    Spec(n, strList(field("bucketCols")), strList(field("sortCols")),
      str(field("schemaDDL")))
  }
}
