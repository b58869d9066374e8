package graft.tools

import org.apache.spark.sql.functions._

/** r16 scratch probe: phase decomposition of a micro-batch replay
  * gate — fixture collect, stream start, per-batch feed, sink
  * read-back — to find where the replay harness's seconds go.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.get("stream-probe")
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm the streaming machinery once at sf0.001
    graft.SparkEntry.queries("stream_outer_replay")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    graft.operators.CacheLedger.release(); spark.catalog.clearCache()

    // replay of stream_outer_replay with per-phase timing
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
    val e = graft.Tables(spark, dir).events
      .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id",
        $"value".cast("double").as("value"), $"event_type")
    def side(tpe: String): Array[(Long, Long, Long, Double)] = time(s"collect $tpe") {
      e.filter($"event_type" === tpe)
        .select($"user_id", $"ts_us", $"event_id", $"value")
        .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._2, r._3))
    }
    def chunks(a: Array[(Long, Long, Long, Double)]) = {
      val sz = math.max(1, (a.length + 3) / 4)
      a.grouped(sz).toSeq.padTo(4, Array.empty[(Long, Long, Long, Double)])
    }
    val (clicks, buys) = (chunks(side("click")), chunks(side("purchase")))
    val maxUs = (clicks.flatten ++ buys.flatten).map(_._2).max
    val cs = MemoryStream[(Long, Long, Long, Double)]
    val ps = MemoryStream[(Long, Long, Long, Double)]
    def asEvents(m: MemoryStream[(Long, Long, Long, Double)]) =
      m.toDS().toDF("user_id", "ts_us", "event_id", "value")
        .withColumn("ts", expr("timestamp_micros(ts_us)"))
        .withWatermark("ts", "2 hours")
    val out = graft.streaming.EventStream.intervalJoinOuter(asEvents(cs), asEvents(ps))
    val sinkDir = graft.operators.TempDirs.fresh("probe_sink")
    val ckpt = graft.operators.TempDirs.fresh("probe_ck")
    val q = time("stream start") {
      out.writeStream.outputMode("append").format("parquet")
        .option("path", sinkDir).option("checkpointLocation", ckpt).start()
    }
    (0 until 4).foreach { i =>
      time(s"batch $i") {
        if (clicks(i).nonEmpty) cs.addData(clicks(i).toSeq)
        if (buys(i).nonEmpty) ps.addData(buys(i).toSeq)
        q.processAllAvailable()
      }
    }
    val hour = 3600000000L
    (1 to 2).foreach { w =>
      time(s"sentinel $w") {
        val t = maxUs + w * 10 * hour
        cs.addData((-1L, t, -w.toLong, 0.0))
        ps.addData((-2L, t, -w.toLong, 0.0))
        q.processAllAvailable()
      }
    }
    time("stop")(q.stop())
    time("read-back + sort") {
      spark.read.schema(out.schema).parquet(sinkDir)
        .filter(col("user_id") >= 0)
        .orderBy("user_id", "click_id", "purchase_id")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
