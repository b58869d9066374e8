package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the r8 "q6 sf1 superlinearity" (round-9 ask #4):
  * builds the Bench sf1 replicated lake two ways (as-is crossJoin
  * output vs sorted-on-write by l_shipdate) and times q6 against
  * sf0.1 and both sf1 layouts, printing the physical plan scan node.
  *
  * VERDICT (measured 2026-08-14, idle 32-thread JVM, min-of-3):
  * sf0.1 = 0.245 s, sf1 as-is = 0.405 s, sf1 sorted = 0.344 s —
  * 1.65× for 10× rows, i.e. SUBLINEAR; the plan pushes all four
  * predicates to the scan and reads 4 columns. The r8 record of
  * 2.01 s was measurement contamination: the Bench sf1 tier runs at
  * the END of the full 354-gate suite inside a debris-laden JVM (the
  * round-3 post-suite-inflation gotcha) and had no fresh-JVM re-time.
  * Fix shipped in Bench: `sf1_headliners_fresh` re-times every sf1
  * headliner in a child JVM; that number is the record. Layout note:
  * sort-on-write by l_shipdate is worth ~15% here (one row group —
  * pruning cannot kick in), not the missing 10×.
  */
object Q6Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = "/root/testdata/sf0.1"
    val t = graft.Tables(spark, base)
    val maxOrder = t.orders.agg(max(col("o_orderkey"))).head().getLong(0) + 1
    val rep = spark.range(10).toDF("__r")
    val li = t.lineitem
    val replicated = li.crossJoin(rep).select(li.columns.map { c =>
      if (c == "l_orderkey") (col(c) + col("__r") * maxOrder).as(c) else col(c)
    }: _*)
    val asIs = "/tmp/q6probe/asis"
    val sorted = "/tmp/q6probe/sorted"
    replicated.write.mode("overwrite").parquet(s"$asIs/lineitem.parquet")
    replicated.sortWithinPartitions("l_shipdate")
      .write.mode("overwrite").parquet(s"$sorted/lineitem.parquet")
    for (n <- Seq("region", "nation", "customer", "supplier", "part", "orders",
      "events", "documents", "embeddings")) {
      val src = if (n == "orders") {
        val o = t.orders
        o.crossJoin(rep).select(o.columns.map { c =>
          if (c == "o_orderkey") (col(c) + col("__r") * maxOrder).as(c) else col(c)
        }: _*)
      } else t.byName(n)
      src.write.mode("overwrite").parquet(s"$asIs/$n.parquet")
      spark.read.parquet(s"$asIs/$n.parquet").write.mode("overwrite").parquet(s"$sorted/$n.parquet")
    }
    def time(dir: String, label: String): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.queries.Relational.q6ForecastRevenue(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q6probe] $label min=${times.min}%.3f all=${times.map(x => f"$x%.2f").mkString(",")}")
    }
    time(base, "sf0.1")
    time(asIs, "sf1-asis")
    time(sorted, "sf1-sorted")
    println("[q6probe] ---- sf1-asis plan ----")
    graft.queries.Relational.q6ForecastRevenue(spark, asIs).explain("formatted")
    spark.stop()
  }
}
