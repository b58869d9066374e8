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
    import org.apache.spark.sql.functions._
    (1 to iters).foreach { k =>
      graft.operators.CacheLedger.release()
      spark.catalog.clearCache()
      graft.operators.BlockedMatch.iterCount.reset()
      graft.operators.BlockedMatch.levCount.reset()
      // sub-stage decomposition with the gate's own blocking recipe
      val c = graft.Tables(spark, dir).customer.select(
        col("c_custkey").cast("long").as("id"), col("c_name").as("name"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"))
      val dirty = c
        .withColumn("p",
          (conv(substring(md5(concat(lit("gr:"), col("name"))), 1, 13), 16, 10).cast("long")
            % (length(col("name")) - 2) + 1).cast("int"))
        .select((col("id") + 10000000L).as("id"),
          expr("concat(substr(name, 1, p), substr(name, p + 2))").as("name"),
          col("cents"))
      val all = c.unionByName(dirty)
      val g = all.select(col("id"), col("name"), col("cents"),
        explode(expr(
          "array_distinct(transform(sequence(1, length(name) - 2), i -> substring(name, i, 3)))"))
          .as("gram"))
        .transform(graft.operators.CacheLedger.persist)
      val nAll = all.agg(count(lit(1)).as("n_all"))
      val rare = g.join(
        g.groupBy(col("gram")).agg(count(lit(1)).as("df_"))
          .crossJoin(broadcast(nAll))
          .filter(col("df_") <= greatest(lit(200L), expr("n_all div 100")))
          .select(col("gram")),
        "gram")
      def t[T](tag: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        println(f"[levprobe] $tag%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
        r
      }
      t("rare count")(rare.count())
      val edges = graft.operators.BlockedMatch.levSpanningEdges(
        rare, Seq("gram", "cents"), "id", "name", maxDist = 2).distinct()
        .transform(graft.operators.CacheLedger.persist)
      val ne = t("edges+distinct")(edges.count())
      val ncc = t("cc")(graft.operators.ClusterDedup.connectedComponents(edges).count())
      graft.operators.CacheLedger.release()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q_golden_record")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[levprobe] iter=$k full=$s%.2f s edges=$ne%,d ccRows=$ncc%,d " +
        f"loopIters=${graft.operators.BlockedMatch.iterCount.sum()}%,d " +
        f"levCalls=${graft.operators.BlockedMatch.levCount.sum()}%,d")
    }
    spark.stop()
  }
}
