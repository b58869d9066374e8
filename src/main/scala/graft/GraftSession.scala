package graft

import org.apache.spark.sql.SparkSession

/** Tuned session factory — every graft entry point runs through this.
  *
  * Local defaults mirror what a 1000-executor deployment would set
  * per-cluster: AQE on (runtime re-plan, skew-join, partition
  * coalescing), UTC session time, shuffle partitions sized to the
  * actual parallelism instead of Spark's default 200.
  */
object GraftSession {
  def cores: Int = Runtime.getRuntime.availableProcessors().min(32)

  def builder(appName: String = "graft", master: String = s"local[$cores]"): SparkSession.Builder =
    SparkSession
      .builder()
      .withExtensions(new GraftExtensions)
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); read as long, converted
      // back to micros in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // micros-lake variant: naive parquet timestamps read as TIMESTAMP
      // (session is UTC, so instants are identical) — keeps filter
      // pushdown on date columns instead of a plan-side NTZ cast
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.ui.enabled", "false")

  def get(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
