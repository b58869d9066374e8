package graft

import graft.functions.VecFns
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN recall artifact (`runMain graft.Recall [sfDir] [nQueries]`):
  * recall@10 vs brute force for every index shape at fixed parameters,
  * printed as ONE JSON line — the per-round `RECALL_r{N}.json` record,
  * so recall drift is visible round-over-round exactly like bench
  * times. (The SimilaritySpec floors catch catastrophic regressions;
  * this artifact catches the slow kind the floors are too loose for.)
  *
  * Ground truth: cosine brute force for the cosine-ranked shapes (LSH,
  * IVF, PQ, IVF-PQ, graph); raw inner product for MIPS — the two
  * orders genuinely differ (that difference is why the augmented
  * transform exists), so MIPS against cosine truth would under-report.
  */
object Recall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nQueries = args.lift(1).map(_.toInt).getOrElse(10)
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
    import spark.implicits._

    val k = 10
    val emb = Tables(spark, sfDir).embeddings.persist()
    val qs = emb.filter($"vec_id" < nQueries)

    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select(col("q_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val cosTruth = pairs(Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", k))
    // MIPS truth ranks by raw inner product (ties by id)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_id").orderBy($"ip".desc, $"id")
    val mipsTruth = pairs(emb.select($"vec_id".as("id"), $"embedding".as("v"))
      .crossJoin(broadcast(qs.select($"vec_id".as("q_id"), $"embedding".as("q_v"))))
      .filter($"id" =!= $"q_id")
      .withColumn("ip", VecFns.dot($"v", $"q_v"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= k)
      .withColumn("neighbor_id", $"id"))

    def recallOf(got: Set[(Long, Long)], truth: Set[(Long, Long)]): Double =
      math.round(10000.0 * (got & truth).size / truth.size) / 10000.0

    val edges = Similarity.knnJoin(emb, "vec_id", "embedding", k = 5)
      .select(col("q_id").as("src"), col("neighbor_id").as("dst"))

    val shapes: Seq[(String, () => Double)] = Seq(
      "lsh" -> (() => recallOf(
        pairs(Similarity.lshTopK(emb, qs, "vec_id", "embedding", k)), cosTruth)),
      "ivf" -> (() => recallOf(
        pairs(Similarity.ivfTopK(emb, qs, "vec_id", "embedding", k)), cosTruth)),
      "pq" -> (() => recallOf(
        pairs(Similarity.pqTopK(emb, qs, "vec_id", "embedding", k)), cosTruth)),
      "ivf_pq" -> (() => recallOf(
        pairs(Similarity.ivfPqTopK(emb, qs, "vec_id", "embedding", k)), cosTruth)),
      "mips" -> (() => recallOf(
        pairs(Similarity.mipsTopK(emb, qs, "vec_id", "embedding", k)), mipsTruth)),
      "graph" -> (() => recallOf(
        pairs(Similarity.graphSearch(emb, qs, edges, "vec_id", "embedding",
          k = k, beam = 4, hops = 3)), cosTruth)))

    val results = shapes.map { case (name, f) => name -> f() }
    val params = """"params":{"k":10,"lsh_planes":4,"ivf_centroids":10,""" +
      """"ivf_nprobe":4,"pq_sub":4,"pq_codebook":8,"graph_beam":4,"graph_hops":3,""" +
      s""""n_queries":$nQueries}"""
    println(s"""{"metric":"recall_at_10","sf":"${sfDir.split('/').last}",""" +
      results.map { case (n, r) => s""""$n":$r""" }.mkString(",") + s",$params}")
    spark.stop()
  }
}
