package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage probe for the block-local union-find (r16): runs
  * q_golden_record in-process and prints BlockedMatch's probe-loop
  * iteration / verifier-call tallies per run — the instrument that
  * adjudicated the r16 loop rebuild (length-break + all-connected
  * exit cut iterations 7.4M → 4.5M at ×10, and the tallies proved a
  * ~2× wall-clock regression was NOT the loop: chain-shaped spanning
  * edges were costing pointer-jumping CC extra shuffle rounds — fixed
  * by star emission).
  * Usage: runMain graft.tools.LevProbe <lakeDir> [iters]
  */
object LevProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_curve_x10")
    val iters = args.lift(1).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder("levprobe", s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to iters).foreach { k =>
      graft.operators.CacheLedger.release()
      spark.catalog.clearCache()
      graft.operators.BlockedMatch.iterCount.reset()
      graft.operators.BlockedMatch.levCount.reset()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q_golden_record")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[levprobe] iter=$k time=$s%.2f s " +
        f"loopIters=${graft.operators.BlockedMatch.iterCount.sum()}%,d " +
        f"levCalls=${graft.operators.BlockedMatch.levCount.sum()}%,d")
    }
    spark.stop()
  }
}
