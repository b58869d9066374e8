package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends GraftSuite {
  import spark.implicits._

  private lazy val emb = Tables(spark, sf0001).embeddings
  private lazy val qs = emb.filter($"vec_id" < 10)

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select($"q_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val truth =
    pairs(Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 10))

  test("brute force returns exactly k ordered neighbors per query") {
    val rows = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 10).collect()
    assert(rows.length == 100)
    val byQ = rows.groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      val cosines = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b }, "descending")
    }
  }

  test("LSH ANN recall@10 >= 0.3 vs brute force") {
    val got = pairs(Similarity.lshTopK(emb, qs, "vec_id", "embedding", 10))
    val recall = (got & truth).size.toDouble / truth.size
    info(s"lsh recall@10 = $recall")
    assert(recall >= 0.3)
  }

  test("IVF ANN recall@10 >= 0.3 vs brute force") {
    val got = pairs(Similarity.ivfTopK(emb, qs, "vec_id", "embedding", 10))
    val recall = (got & truth).size.toDouble / truth.size
    info(s"ivf recall@10 = $recall")
    assert(recall >= 0.3)
  }
}
