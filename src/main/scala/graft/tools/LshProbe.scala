package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the minhash-LSH x100 spill (round-9 scale curve):
  * per tier, counts docs, band-signature bucket sizes, candidate
  * pairs, and the toks-byte volume the verify join must sort —
  * separates "candidates grow superlinearly (blocking collapsed)"
  * from "linear candidates whose sort payload outgrows sandbox
  * scratch disk".
  */
object LshProbe {
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
    import spark.implicits._
    val dirs = args.toSeq match {
      case Nil => Seq("/root/testdata/sf0.1", "/tmp/graft_curve_x10", "/tmp/graft_curve_x100")
      case ds => ds
    }
    for (dir <- dirs) {
      val docs = graft.Tables(spark, dir).documents
      val n = docs.count()
      val sigs = graft.operators.Dedup.bandSignatures(docs, "doc_id", "text",
        perms = 128, bands = 16)
      val buckets = sigs.groupBy($"band", $"bsig").agg(count(lit(1)).as("g"))
        .agg(count(lit(1)).as("n_buckets"), max($"g").as("max_bucket"),
          sum(expr("g * (g - 1) div 2")).as("pre_distinct_pairs"))
        .collect().head
      val cand = graft.operators.Dedup.lshCandidates(docs, "doc_id", "text",
        perms = 128, bands = 16).count()
      val tokBytes = graft.operators.Dedup.tokenSets(docs, "doc_id", "text")
        .select(sum(size($"toks"))).collect().head.getLong(0)
      println(s"[lshprobe] $dir docs=$n buckets=${buckets.getLong(0)} " +
        s"max_bucket=${buckets.getLong(1)} pre_distinct_pairs=${buckets.getLong(2)} " +
        s"candidates=$cand tok_entries=$tokBytes")
      graft.operators.CacheLedger.release()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
