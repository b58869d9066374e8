package graft.tools

import org.apache.spark.sql.functions._

/** Builds the sf1 bench lakes (flat 10×-replicated + orderkey-bucketed)
  * outside a full Bench run, so headliner perf work can iterate on the
  * exact tier the artifact measures. Same construction as Bench's sf1
  * tier: order keys shift per replica so join fan-out per key stays
  * realistic; dims are reused (facts outgrow dims in a real lake).
  *
  * Usage: runMain graft.tools.Sf1Lakes [sfDir] [flatOut] [bucketedOut]
  */
object Sf1Lakes {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val flat = args.lift(1).getOrElse("/tmp/graft_bench_sf1")
    val bucketed = args.lift(2).getOrElse("/tmp/graft_bench_sf1b")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().min(32).toString)
    val spark = graft.GraftSession.builder("sf1lakes", s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.Tables(spark, sfDir)
    val maxOrder = t.orders.agg(max(col("o_orderkey"))).head().getLong(0) + 1
    def replicate(df: org.apache.spark.sql.DataFrame, shifts: Map[String, Long]) = {
      val rep = spark.range(10).toDF("__r")
      df.crossJoin(rep).select(df.columns.map { c =>
        shifts.get(c) match {
          case Some(step) => (col(c) + col("__r") * step).as(c)
          case None => col(c)
        }
      }: _*)
    }
    replicate(t.orders, Map("o_orderkey" -> maxOrder))
      .write.mode("overwrite").parquet(s"$flat/orders.parquet")
    replicate(t.lineitem, Map("l_orderkey" -> maxOrder))
      .write.mode("overwrite").parquet(s"$flat/lineitem.parquet")
    for (n <- Seq("region", "nation", "customer", "supplier", "part", "events",
      "documents", "embeddings"))
      t.byName(n).write.mode("overwrite").parquet(s"$flat/$n.parquet")
    val src = graft.Tables(spark, flat)
    graft.sources.BucketedLake.write(src.orders, s"$bucketed/orders.parquet",
      cpus.toInt, Seq("o_orderkey"), Seq("o_orderkey"))
    graft.sources.BucketedLake.write(src.lineitem, s"$bucketed/lineitem.parquet",
      cpus.toInt, Seq("l_orderkey"), Seq("l_orderkey"))
    for (n <- Seq("region", "nation", "customer", "supplier", "part", "events",
      "documents", "embeddings"))
      spark.read.parquet(s"$flat/$n.parquet")
        .write.mode("overwrite").parquet(s"$bucketed/$n.parquet")
    println(s"[sf1lakes] flat=$flat bucketed=$bucketed")
    spark.stop()
  }
}
