package graft.tools

import graft.{GraftExtensions, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Stage decomposition of `dedup_clusters` on the GROWING-CARDINALITY
  * lakes (`runMain graft.tools.GcProbe [dirs]`) — the r15 judge ask #1
  * diagnosis: the exact-set collapse is a structural no-op when every
  * replica re-letters with a fresh alphabet, so WHERE does the ×100
  * tier's 176 s go? Per lake this prints one JSON line decomposing the
  * gate into its plan stages:
  *  - `n_docs`, `n_reps` (distinct shingle sets — collapse leverage),
  *  - shingle-df structure: postings, max df, candidate join volume
  *    Σ C(df,2) over sub-cap shingles, and the share of that volume
  *    from shingles with NO lowercase letter (digit/space-only
  *    shingles are NOT re-lettered by the growing lake, so they stay
  *    shared across replicas and their df grows with the replica
  *    count — the suspected quadratic),
  *  - stage timings: candidate+intersection groupBy (n_cand rows
  *    out), verified rep pairs, CC to convergence.
  */
object GcProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_curve_x10g", "/tmp/graft_curve_x100g")
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

    def releaseAll(): Unit = {
      graft.operators.CacheLedger.release()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(r => try r.unpersist(blocking = true) catch { case _: Throwable => () })
      System.gc()
    }

    dirs.foreach { dir =>
      releaseAll()
      val docs = Tables(spark, dir).documents
      val cap = 10000L
      def now() = System.nanoTime()
      // stage 0: shingle sets (the gate's exact recipe: 3-gram word shingles)
      val t0 = now()
      val sets = docs.select(col("doc_id").as("id"),
        array_sort(graft.functions.TextFns.shingles(col("text"), 3)).as("shs"))
        .filter(col("shs").isNotNull && size(col("shs")) > 0)
        .localCheckpoint()
      val nDocs = sets.count()
      val tSets = (now() - t0) / 1e9
      // stage 1: exact-set collapse
      val t1 = now()
      val groups = sets.groupBy(col("shs")).agg(min(col("id")).as("rep"))
        .localCheckpoint()
      val nReps = groups.count()
      val tGroups = (now() - t1) / 1e9
      // shingle-df structure over REPS (what the candidate join sees)
      val t2 = now()
      val sh = groups.select(col("rep").as("id"), explode(col("shs")).as("sh"))
        .localCheckpoint()
      val postings = sh.count()
      val dfs = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"),
          max(col("sh").rlike("[a-z]")).as("has_letter"))
        .localCheckpoint()
      val stats = dfs.agg(
        count(lit(1)).as("n_shingles"), max(col("df")).as("max_df"),
        sum(when(col("df") <= cap, expr("df * (df - 1) div 2")).otherwise(0L))
          .cast("long").as("cand_vol"),
        sum(when(col("df") <= cap && !col("has_letter"), expr("df * (df - 1) div 2"))
          .otherwise(0L)).cast("long").as("cand_vol_noletter"),
        sum(when(col("df") > cap, 1L).otherwise(0L)).as("n_hot")).head()
      val tDfs = (now() - t2) / 1e9
      // stage 2: the gate's candidate+intersection groupBy (rare join)
      val t3 = now()
      val hot = dfs.filter(col("df") > cap).select(col("sh"))
      val rare = sh.join(hot, Seq("sh"), "left_anti")
      val interRare = rare.as("a").join(rare.as("b"), "sh")
        .filter(col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(count(lit(1)).as("inter_rare"))
        .localCheckpoint()
      val nCand = interRare.count()
      val tCand = (now() - t3) / 1e9
      // stage 3: verify (attach sizes; hot sets ignored — probe only;
      // at these lakes n_hot is reported so the omission is visible)
      val t4 = now()
      val szs = groups.select(col("rep"), size(col("shs")).cast("long").as("sz"))
      val verified = interRare
        .join(szs.select(col("rep").as("id_a"), col("sz").as("sz_a")).hint("shuffle_hash"), "id_a")
        .join(szs.select(col("rep").as("id_b"), col("sz").as("sz_b")).hint("shuffle_hash"), "id_b")
        .filter(col("inter_rare").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter_rare")) >= 0.6)
        .select(col("id_a"), col("id_b"))
        .localCheckpoint()
      val nVer = verified.count()
      val tVer = (now() - t4) / 1e9
      // stage 4: CC over star + rep pairs
      val t5 = now()
      val star = sets.join(groups, "shs").select(col("rep").as("id_a"), col("id").as("id_b"))
        .filter(col("id_a") =!= col("id_b"))
      val edges = verified.unionByName(star)
      val nComp = graft.operators.ClusterDedup.connectedComponents(edges)
        .groupBy(col("cluster")).agg(count(lit(1))).count()
      val tCc = (now() - t5) / 1e9
      println(f"""{"metric":"gc_probe","dir":"$dir","n_docs":$nDocs,"n_reps":$nReps,""" +
        f""""sets_sec":$tSets%.2f,"groups_sec":$tGroups%.2f,"dfstats_sec":$tDfs%.2f,""" +
        f""""postings":$postings,"n_shingles":${stats.getLong(0)},"max_df":${stats.getLong(1)},""" +
        f""""cand_vol":${stats.getLong(2)},"cand_vol_noletter":${stats.getLong(3)},"n_hot":${stats.getLong(4)},""" +
        f""""n_cand":$nCand,"cand_sec":$tCand%.2f,"n_verified":$nVer,"verify_sec":$tVer%.2f,""" +
        f""""n_clusters":$nComp,"cc_sec":$tCc%.2f}""")
      releaseAll()
    }
    spark.stop()
  }
}
