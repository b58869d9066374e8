package graft.tools

import graft.{GraftExtensions, ScaleCurve, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** `dedup_clusters` ×100 scale diagnosis (`runMain graft.tools.CcProbe
  * [tiers]`), the SCALE_r9 watch item: its x10→x100 per-10× time ratio
  * trended 5.37 → 9.12, and the question is WHERE the growth comes
  * from — candidate-edge volume (input-shaped), pointer-jump round
  * count (diameter-shaped), or per-round cost (a plan defect).
  *
  * For each tier lake (built by the shared [[ScaleCurve.buildLake]]
  * recipe so the probe measures exactly what the curve times) this
  * prints, as one JSON line per tier:
  *  - `n_docs`, and the corpus's exact-duplicate structure
  *    (`n_text_groups_ge2`, `max_text_group`): the lake's Caesar key
  *    is (r mod 26, r div 26 mod 10), so at ×100 a digit-free doc
  *    collides with its r±26k replicas — cross-replica EXACT-dup
  *    families the ×10 tier cannot have;
  *  - `n_pairs`: the 3-gram Jaccard ≥ 0.6 pair-graph edges the CC
  *    consumes (the gate's exact candidate recipe);
  *  - `rounds`: pointer-jump iterations to fixpoint, with per-round
  *    changed-label counts and seconds.
  *
  * The reading (recorded in SCALE_r10.json notes): if `n_pairs` grows
  * superlinearly while `rounds` stays ~constant and per-round time
  * tracks `n_pairs`, the trend is the LAKE's duplicate structure —
  * quadratic pair growth inside cross-replica dup families — not a
  * plan defect; the per-edge cost is the invariant to pin.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val tiers = args.headOption.getOrElse("1,10,100").split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().min(32).toString)
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
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
    val t = Tables(spark, base)

    def releaseAll(): Unit = {
      graft.operators.CacheLedger.release()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(r => try r.unpersist(blocking = true) catch { case _: Throwable => () })
      System.gc()
    }

    tiers.foreach { r =>
      val dir =
        if (r <= 1) base
        else {
          val out = s"/tmp/graft_curve_x$r"
          val marker = new java.io.File(s"$out/.built")
          if (!marker.exists()) {
            System.err.println(s"[ccprobe] building ${r}x lake at $out")
            ScaleCurve.buildLake(spark, t, r, out)
            marker.getParentFile.mkdirs(); marker.createNewFile()
          }
          out
        }
      releaseAll()
      val docs = Tables(spark, dir).documents
      val nDocs = docs.count()
      // exact-duplicate structure of the tier (md5 of raw text)
      val grp = docs.groupBy(md5(col("text"))).agg(count(lit(1)).as("m"))
        .filter(col("m") >= 2).agg(count(lit(1)).as("g"),
          coalesce(max(col("m")), lit(0L)).as("mx")).head()
      val (nGroups, maxGroup) = (grp.getLong(0), grp.getLong(1))
      // the gate's exact pair recipe, materialized once
      val t0 = System.nanoTime()
      val pairs = graft.operators.Dedup.ngramJaccardPairs(
        docs, "doc_id", "text", n = 3, tau = 0.6)
        .select(col("id_a"), col("id_b")).localCheckpoint()
      val nPairs = pairs.count()
      val tPairs = (System.nanoTime() - t0) / 1e9
      // the CC loop, instrumented round by round (same shape as
      // ClusterDedup.connectedComponents — seed with least(id, min
      // neighbor), propagate + pointer-jump + eager checkpoint)
      val edges = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
        .unionByName(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
        .persist()
      var labels = edges.groupBy(col("u"))
        .agg(min(col("v")).as("nmin"))
        .select(col("u").as("id"), least(col("u"), col("nmin")).as("lbl"))
        .localCheckpoint()
      var rounds = 0
      var converged = false
      val roundStats = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      while (!converged && rounds < 20) {
        val r0 = System.nanoTime()
        val neighborMin = edges
          .join(labels.withColumnRenamed("id", "v2"), col("v") === col("v2"))
          .groupBy(col("u").as("id")).agg(min(col("lbl")).as("nmin"))
        val propagated = labels.join(neighborMin, Seq("id"), "left")
          .select(col("id"),
            least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl"))
        val jumped = propagated.as("x")
          .join(propagated.select(col("id").as("p_id"), col("lbl").as("p_lbl")).as("y"),
            col("x.lbl") === col("y.p_id"), "left")
          .select(col("x.id").as("id"),
            least(col("x.lbl"), coalesce(col("p_lbl"), col("x.lbl"))).as("lbl"))
        val next = jumped.localCheckpoint()
        val changed = next.join(labels.withColumnRenamed("lbl", "old"), "id")
          .filter(col("lbl") =!= col("old")).count()
        labels = next
        converged = changed == 0
        rounds += 1
        roundStats += ((changed, (System.nanoTime() - r0) / 1e9))
      }
      edges.unpersist()
      val rs = roundStats.map { case (c, s) => f"""{"changed":$c,"sec":$s%.2f}""" }
        .mkString("[", ",", "]")
      println(f"""{"metric":"cc_probe","tier":$r,"n_docs":$nDocs,""" +
        f""""n_text_groups_ge2":$nGroups,"max_text_group":$maxGroup,""" +
        f""""n_pairs":$nPairs,"pairs_sec":$tPairs%.2f,"rounds":$rounds,"round_stats":$rs,""" +
        f""""sec_per_medge_round":${roundStats.map(_._2).sum / rounds / (nPairs.max(1) / 1e6)}%.3f}""")
      releaseAll()
    }
    spark.stop()
  }
}
