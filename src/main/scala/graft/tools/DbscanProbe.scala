package graft.tools

import org.apache.spark.sql.functions._

/** r16 scratch probe: stage-level decomposition of emb_dbscan —
  * where do the gate's seconds go (pair generation, degree pass,
  * components, border attach)? Timing mirrors Bench (noop sink).
  */
object DbscanProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.get("dbscan-probe")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm
    val e0 = graft.Tables(spark, "/root/testdata/sf0.001").embeddings
    graft.operators.Dbscan.fit(e0, "vec_id", "embedding", 0.3, 3)
      .write.format("noop").mode("overwrite").save()
    graft.operators.CacheLedger.release(); spark.catalog.clearCache()

    val emb = graft.Tables(spark, dir).embeddings
    time("epsPairs") {
      graft.operators.Dbscan.epsPairs(emb, "vec_id", "embedding", 0.3)
        .write.format("noop").mode("overwrite").save()
    }
    val pairs = graft.operators.CacheLedger.persist(
      graft.operators.Dbscan.epsPairs(emb, "vec_id", "embedding", 0.3))
    time("pairs persist fill") {
      pairs.write.format("noop").mode("overwrite").save()
    }
    val neighbors = pairs.select(col("id_a").as("id"), col("id_b").as("nb"))
      .unionByName(pairs.select(col("id_b").as("id"), col("id_a").as("nb")))
    val degrees = neighbors.groupBy("id").agg(count(lit(1)).as("deg"))
    val cores = graft.operators.CacheLedger.persist(
      degrees.filter(col("deg") >= 3).select(col("id")))
    time("degrees+cores") {
      cores.write.format("noop").mode("overwrite").save()
    }
    val coreEdges = pairs
      .join(cores.withColumnRenamed("id", "id_a"), "id_a")
      .join(cores.withColumnRenamed("id", "id_b"), "id_b")
      .select(col("id_a"), col("id_b"))
    time("connectedComponents") {
      graft.operators.ClusterDedup.connectedComponents(coreEdges)
        .write.format("noop").mode("overwrite").save()
    }
    // manual replay of the CC internals: contraction, then the
    // pointer-jumping loop with per-round timing
    locally {
      val edges = coreEdges.select(col("id_a").as("u"), col("id_b").as("v"))
        .unionByName(coreEdges.select(col("id_b").as("u"), col("id_a").as("v")))
        .persist()
      println(s"[probe] core edge rows (sym) = ${edges.count()}")
      val l = edges.groupBy(col("u")).agg(min(col("v")).as("nmin"))
        .select(col("u").as("id"), least(col("u"), col("nmin")).as("lbl"))
        .localCheckpoint()
      val contracted = edges
        .join(l.select(col("id").as("u"), col("lbl").as("lu")).hint("shuffle_hash"), "u")
        .join(l.select(col("id").as("v"), col("lbl").as("lv")).hint("shuffle_hash"), "v")
        .filter(col("lu") =!= col("lv"))
        .select(least(col("lu"), col("lv")).as("id_a"),
          greatest(col("lu"), col("lv")).as("id_b"))
        .distinct()
      time("contraction")(println(s"[probe] contracted edges = ${contracted.count()}"))
      val e2 = contracted.select(col("id_a").as("u"), col("id_b").as("v"))
        .unionByName(contracted.select(col("id_b").as("u"), col("id_a").as("v"))).persist()
      var labels = e2.groupBy(col("u")).agg(min(col("v")).as("nmin"))
        .select(col("u").as("id"), least(col("u"), col("nmin")).as("lbl"))
        .localCheckpoint()
      var iter = 0; var converged = false
      def step(tag: String)(f: => Long): Long = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[probe]   $tag%-14s ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      while (!converged && iter < 20) {
        val t0 = System.nanoTime()
        val neighborMin = e2
          .join(labels.withColumnRenamed("id", "v2").hint("shuffle_hash"), col("v") === col("v2"))
          .groupBy(col("u").as("id")).agg(min(col("lbl")).as("nmin"))
        val propagated = labels.join(neighborMin, Seq("id"), "left")
          .select(col("id"), least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl"))
        val jumped = propagated.as("x")
          .join(propagated.select(col("id").as("p_id"), col("lbl").as("p_lbl")).as("y"),
            col("x.lbl") === col("y.p_id"), "left")
          .select(col("x.id").as("id"),
            least(col("x.lbl"), coalesce(col("p_lbl"), col("x.lbl"))).as("lbl"))
        var next: org.apache.spark.sql.DataFrame = null
        step("checkpoint") { next = jumped.localCheckpoint(); 0L }
        val changed = step("changed count") {
          next.join(labels.withColumnRenamed("lbl", "old"), "id")
            .filter(col("lbl") =!= col("old")).limit(1).count()
        }
        labels = next; converged = changed == 0; iter += 1
        println(f"[probe] round $iter: ${(System.nanoTime() - t0) / 1e9}%.2f s changed=$changed")
      }
    }
    graft.operators.CacheLedger.release(); spark.catalog.clearCache()
    time("full fit") {
      graft.operators.Dbscan.fit(emb, "vec_id", "embedding", 0.3, 3)
        .write.format("noop").mode("overwrite").save()
    }
    graft.operators.CacheLedger.release(); spark.catalog.clearCache()
    time("full fit again") {
      graft.operators.Dbscan.fit(emb, "vec_id", "embedding", 0.3, 3)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
