package graft.tools

import org.apache.spark.sql.functions._

/** Phase probe for the persisted IVF+SQ8 index gates
  * (ann_ivf_sq8_persisted / _trained / _append): splits each gate into
  * its count/train/build/append/query phases so the optimization round
  * can see which pass carries the seconds (guide §1 — measure first;
  * at sf0.1 the corpus is 2 000 vectors, so everything here is
  * fixed-cost structure: job count, tiny-file I/O, exchanges). Usage:
  *   runMain graft.tools.AnnIndexProbe <lakeDir> [iters]
  */
object AnnIndexProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder("annprobe", s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{CacheLedger, Similarity, TempDirs}

    def timed(tag: String)(f: => Unit): Unit = {
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[annprobe] $tag%-34s min=${ts.min}%6.3f s median=${ts.sorted.apply(ts.size / 2)}%6.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val e = graft.Tables(spark, dir).embeddings
    val q = e.filter(col("vec_id") % 20 === 0)
    var c = 0; var np = 0
    timed("count + scaled params") {
      c = Similarity.scaledCentroids(e.count()); np = Similarity.scaledNprobe(c)
    }
    println(s"[annprobe] c=$c np=$np")

    timed("kmeansFit 2 rounds (noop)") {
      noop(Similarity.kmeansFit(e, "vec_id", "embedding", c, 2))
      CacheLedger.release()
    }
    var idxSeed: String = null
    timed("build seeded") {
      idxSeed = TempDirs.fresh("graft_annprobe")
      Similarity.ivfSq8IndexBuild(e, "vec_id", "embedding", c, np, idxSeed)
      CacheLedger.release()
    }
    var idxTr: String = null
    timed("build trained (2 rounds)") {
      idxTr = TempDirs.fresh("graft_annprobe")
      Similarity.ivfSq8IndexBuild(e, "vec_id", "embedding", c, np, idxTr, trainRounds = 2)
      CacheLedger.release()
    }
    timed("query persisted") {
      noop(Similarity.ivfSq8IndexQuery(idxSeed, e, q, "vec_id", "embedding", k = 10, fetch = 8))
      CacheLedger.release()
    }
    // append phases
    val base = e.filter(col("vec_id") % 10 =!= 3)
    val delta = e.filter(col("vec_id") % 10 === 3)
    val cB = Similarity.scaledCentroids(base.count()); val npB = Similarity.scaledNprobe(cB)
    timed("append build(base)") {
      idxSeed = TempDirs.fresh("graft_annprobe")
      Similarity.ivfSq8IndexBuild(base, "vec_id", "embedding", cB, npB, idxSeed)
      CacheLedger.release()
    }
    timed("append delta") {
      Similarity.ivfSq8IndexAppend(idxSeed, delta, "vec_id", "embedding")
      CacheLedger.release()
    }
    // file layout of the artifact
    val codesDir = new java.io.File(s"$idxTr/codes")
    val nFiles = Option(codesDir.listFiles).map(_.flatMap(d =>
      Option(d.listFiles).getOrElse(Array.empty[java.io.File]).toSeq
        .filter(_.getName.endsWith(".parquet"))).size).getOrElse(-1)
    println(s"[annprobe] trained codes/ parquet files: $nFiles across ${Option(codesDir.listFiles).map(_.count(_.isDirectory)).getOrElse(-1)} lists")
    spark.stop()
  }
}
