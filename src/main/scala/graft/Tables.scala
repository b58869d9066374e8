package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Star-schema loaders for the driver-generated lake (see TESTDATA.md).
  *
  * All operators consume these instead of raw paths so the same code
  * path serves `file://` test data and an `s3a://` 100 TB lake — only
  * the directory URI changes.
  */
final case class Tables(spark: SparkSession, dir: String) {
  /** Layout-aware load: a table directory carrying a
    * [[graft.sources.BucketedLake]] marker reads through a
    * re-registered bucketed table (joins/aggregates on the bucket key
    * skip their exchange — the write-once layout survives into every
    * session); a plain directory is a plain parquet read. The marker
    * probe is one `getFileStatus` per load — nothing at scan time.
    */
  private def load(name: String): DataFrame =
    graft.sources.BucketedLake.read(spark, s"$dir/$name.parquet")

  def region: DataFrame     = load("region")
  def nation: DataFrame     = load("nation")
  def customer: DataFrame   = load("customer")
  def supplier: DataFrame   = load("supplier")
  def part: DataFrame       = load("part")
  def orders: DataFrame     = load("orders")
  def lineitem: DataFrame   = load("lineitem")

  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects; with `spark.sql.legacy.parquet.nanosAsLong`
    * (set in GraftSession/Verify/Bench) it arrives as a nanos long and
    * is converted here. Integer division — nanos (~1.7e18) overflow
    * double precision.
    */
  def events: DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = load("events")
    raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) lake read under nanosAsLong
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => // TIMESTAMP(MICROS, isAdjustedToUTC=false) lake:
        // naive micros ≡ UTC instants under the session's UTC zone —
        // the cast is value-preserving and restores the TIMESTAMP type
        // the whole operator surface (unix_micros etc.) consumes
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents: DataFrame  = load("documents")
  def embeddings: DataFrame = load("embeddings")

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Routed through the typed accessors so schema fixes (events'
    * nanos conversion) apply to generic callers too.
    */
  def byName(name: String): DataFrame = name match {
    case "events" => events
    case other => load(other)
  }
}
