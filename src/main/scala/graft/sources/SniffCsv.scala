package graft.sources

import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Delimiter/encoding-sniffing CSV source (SURVEY.md §2.1).
  *
  * Re-expresses the reference's `detect_csv_delimiter` (csv.Sniffer
  * over a 4 KiB sample, streamlit_app.py:78) and `bytes_to_text`
  * (utf-8-sig → latin-1 fallback, streamlit_app.py:86) Spark-first:
  * the sniff reads a bounded sample on the driver (inherently a
  * sample-sized operation), then the actual load is a distributed
  * `spark.read.csv` with the detected dialect — so a 100 TB directory
  * of uniform CSVs still scans fully parallel.
  *
  * Mirrors the reference's `dtype=str`: every column arrives as
  * string; callers cast afterwards (schema-on-read).
  */
object SniffCsv {
  val Candidates: Seq[Char] = Seq(',', ';', '\t', '|')
  private val SampleBytes = 4096

  final case class Dialect(delimiter: Char, charset: String)

  /** Read the first file's head bytes for sniffing. */
  private def sampleBytes(spark: SparkSession, path: String): Array[Byte] = {
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val file =
      if (fs.getFileStatus(hPath).isDirectory)
        fs.listStatus(hPath).filter(s => s.isFile && s.getLen > 0)
          .map(_.getPath).sortBy(_.getName)
          .headOption.getOrElse(sys.error(s"no data files under $path"))
      else hPath
    val in = fs.open(file)
    try {
      val buf = new Array[Byte](SampleBytes)
      var off = 0
      var n = 0
      while (off < buf.length && { n = in.read(buf, off, buf.length - off); n > 0 })
        off += n
      buf.take(off)
    } finally in.close()
  }

  /** UTF-8 if the sample decodes cleanly, else latin-1 — the
    * reference's fallback chain. Decodes with endOfInput=false so a
    * multi-byte character truncated by the 4 KiB sample boundary
    * reads as underflow, not as malformed input (otherwise any
    * accented character near the boundary would misdetect the whole
    * file as latin-1).
    */
  def sniffCharset(sample: Array[Byte]): String = {
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    val out = java.nio.CharBuffer.allocate(sample.length)
    val res = dec.decode(java.nio.ByteBuffer.wrap(sample), out, false)
    if (res.isError) "ISO-8859-1" else "UTF-8"
  }

  /** Pick the candidate whose per-line count is consistent and maximal
    * across sample lines (csv.Sniffer's core heuristic).
    */
  def sniffDelimiter(sample: String): Char = {
    val lines = sample.split("\r?\n").filter(_.nonEmpty).take(10)
    if (lines.isEmpty) return ','
    val scored = Candidates.map { d =>
      val counts = lines.map(_.count(_ == d))
      val consistent = counts.nonEmpty && counts.forall(_ == counts.head) && counts.head > 0
      (d, consistent, counts.headOption.getOrElse(0))
    }
    scored.filter(_._2).sortBy(-_._3).headOption.map(_._1)
      .getOrElse(scored.sortBy(-_._3).head._1)
  }

  def sniff(spark: SparkSession, path: String): Dialect = {
    val bytes = sampleBytes(spark, path)
    val charset = sniffCharset(bytes)
    val text = new String(bytes, charset).stripPrefix("﻿")
    Dialect(sniffDelimiter(text), charset)
  }

  /** The header line exactly as written — Spark's reader renames
    * duplicate columns on read, so structural header checks (blank /
    * duplicate names, reference streamlit_app.py:185-189) must look at
    * the raw bytes.
    */
  def rawHeader(spark: SparkSession, path: String): Array[String] = {
    val bytes = sampleBytes(spark, path)
    val charset = sniffCharset(bytes)
    val text = new String(bytes, charset).stripPrefix("﻿")
    val line = text.split("\r?\n").headOption.getOrElse("")
    splitQuoted(line, sniffDelimiter(text))
  }

  /** RFC-4180 single-line split: a quoted field may contain the
    * delimiter (`"last, first"`), and a doubled quote inside a quoted
    * field escapes one quote. A naive `split(delim)` mis-splits such
    * headers into phantom blank/duplicate names.
    */
  private[graft] def splitQuoted(line: String, delim: Char): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQuote = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQuote) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { cur += '"'; i += 1 }
          else inQuote = false
        } else cur += c
      } else {
        if (c == '"' && cur.isEmpty) inQuote = true
        else if (c == delim) { out += cur.toString; cur.clear() }
        else cur += c
      }
      i += 1
    }
    out += cur.toString
    out.toArray
  }

  /** Distributed all-string read with the sniffed dialect.
    *
    * FAILFAST, not Spark's default PERMISSIVE: the reference reads
    * with `on_bad_lines="error"` (streamlit_app.py:169), so a single
    * ragged row rejects the whole file. PERMISSIVE would silently
    * null-pad/truncate malformed rows and accept a file the
    * reference refuses — a fidelity divergence, and at 100 TB a
    * silent data-corruption vector. The throw surfaces at first
    * action; `Pipeline.ingestWith` maps it to the reference's
    * "Failed to parse file" issue.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val d = sniff(spark, path)
    val df = spark.read
      .option("header", "true")
      .option("delimiter", d.delimiter.toString)
      .option("encoding", d.charset)
      .option("inferSchema", "false")
      .option("mode", "FAILFAST")
      .csv(path)
    // strip a lingering BOM from the first header (utf-8-sig parity)
    df.columns.headOption match {
      case Some(first) if first.startsWith("﻿") =>
        df.withColumnRenamed(first, first.stripPrefix("﻿"))
      case _ => df
    }
  }

  /** Quarantine read — the at-scale complement of [[read]]'s
    * FAILFAST: PERMISSIVE with a `_corrupt` column, so malformed rows
    * land in quarantine WITH their raw line while clean rows flow.
    * The reference (single files, human in the loop) aborts; a
    * 100 TB intake can't let one bad line park a petabyte — it
    * quarantines and accounts. Returns the frame with `_corrupt`
    * (NULL for clean rows); callers split/count. The corrupt column
    * must be materialized in the same projection as the data columns
    * (Spark requires selecting the raw column with the parsed ones).
    */
  def readQuarantine(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val d = sniff(spark, path)
    def opts(r: org.apache.spark.sql.DataFrameReader) = r
      .option("header", "true")
      .option("delimiter", d.delimiter.toString)
      .option("encoding", d.charset)
      .option("inferSchema", "false")
    // pass 1: headers only (all-string schema from the header line);
    // pass 2: same schema + the corrupt sink — Spark only routes
    // malformed records when the user schema CONTAINS the field.
    // Ragged rows in BOTH directions (token deficit and surplus)
    // quarantine with their raw line (RobustQSpec pins this).
    val base = opts(spark.read).csv(path).schema
    val schema = StructType(base.fields :+ StructField("_corrupt", StringType))
    opts(spark.read)
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)
  }
}
