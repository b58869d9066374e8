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

    // The default operating point per shape (the flat keys, compared
    // round-over-round) PLUS a recall/parameter curve: each knob is
    // the recall↔cost trade an index shopper tunes BEFORE shipping —
    // the artifact shows the knob actually buys recall, and how much.
    val curve: Seq[(String, Seq[(String, () => Double)])] = Seq(
      "lsh" -> Seq(
        "planes=4" -> (() => recallOf(
          pairs(Similarity.lshTopK(emb, qs, "vec_id", "embedding", k, planes = 4)), cosTruth)),
        "planes=3" -> (() => recallOf(
          pairs(Similarity.lshTopK(emb, qs, "vec_id", "embedding", k, planes = 3)), cosTruth)),
        "planes=2" -> (() => recallOf(
          pairs(Similarity.lshTopK(emb, qs, "vec_id", "embedding", k, planes = 2)), cosTruth))),
      "ivf" -> Seq(
        "c=10,nprobe=2" -> (() => recallOf(
          pairs(Similarity.ivfTopK(emb, qs, "vec_id", "embedding", k, 10, 2)), cosTruth)),
        "c=10,nprobe=4" -> (() => recallOf(
          pairs(Similarity.ivfTopK(emb, qs, "vec_id", "embedding", k, 10, 4)), cosTruth)),
        "c=10,nprobe=8" -> (() => recallOf(
          pairs(Similarity.ivfTopK(emb, qs, "vec_id", "embedding", k, 10, 8)), cosTruth))),
      "pq" -> Seq(
        "sub=4,cb=8" -> (() => recallOf(
          pairs(Similarity.pqTopK(emb, qs, "vec_id", "embedding", k, 4, 8)), cosTruth)),
        "sub=8,cb=8" -> (() => recallOf(
          pairs(Similarity.pqTopK(emb, qs, "vec_id", "embedding", k, 8, 8)), cosTruth)),
        "sub=8,cb=16" -> (() => recallOf(
          pairs(Similarity.pqTopK(emb, qs, "vec_id", "embedding", k, 8, 16)), cosTruth))),
      "ivf_pq" -> Seq(
        "c=10,np=4,sub=4,cb=8" -> (() => recallOf(
          pairs(Similarity.ivfPqTopK(emb, qs, "vec_id", "embedding", k, 10, 4, 4, 8)), cosTruth)),
        "c=10,np=8,sub=8,cb=16" -> (() => recallOf(
          pairs(Similarity.ivfPqTopK(emb, qs, "vec_id", "embedding", k, 10, 8, 8, 16)), cosTruth))),
      "mips" -> Seq(
        "planes=4" -> (() => recallOf(
          pairs(Similarity.mipsTopK(emb, qs, "vec_id", "embedding", k, planes = 4)), mipsTruth)),
        "planes=2" -> (() => recallOf(
          pairs(Similarity.mipsTopK(emb, qs, "vec_id", "embedding", k, planes = 2)), mipsTruth))),
      "graph" -> Seq(
        "beam=4,hops=3" -> (() => recallOf(
          pairs(Similarity.graphSearch(emb, qs, edges, "vec_id", "embedding", k, 4, 3)), cosTruth)),
        "beam=8,hops=4" -> (() => recallOf(
          pairs(Similarity.graphSearch(emb, qs, edges, "vec_id", "embedding", k, 8, 4)), cosTruth)),
        "beam=16,hops=5" -> (() => recallOf(
          pairs(Similarity.graphSearch(emb, qs, edges, "vec_id", "embedding", k, 16, 5)), cosTruth))))

    val defaults = Map("lsh" -> "planes=4", "ivf" -> "c=10,nprobe=4",
      "pq" -> "sub=4,cb=8", "ivf_pq" -> "c=10,np=4,sub=4,cb=8",
      "mips" -> "planes=4", "graph" -> "beam=4,hops=3")
    val evaluated = curve.map { case (shape, pts) =>
      shape -> pts.map { case (p, f) => p -> f() }
    }
    val flat = evaluated.map { case (shape, pts) =>
      s""""$shape":${pts.toMap.apply(defaults(shape))}"""
    }.mkString(",")
    val curveJson = evaluated.map { case (shape, pts) =>
      s""""$shape":{${pts.map { case (p, r) => s""""$p":$r""" }.mkString(",")}}"""
    }.mkString(",")
    println(s"""{"metric":"recall_at_10","sf":"${sfDir.split('/').last}",""" +
      flat + s""","curve":{$curveJson},"params":{"k":10,"n_queries":$nQueries}}""")
    spark.stop()
  }
}
