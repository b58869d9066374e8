package graft

import graft.queries.RankQ
import graft.functions.VecFns
import org.apache.spark.sql.functions._

/** Round-7 wave P (queries/RankQ.scala) — retrieval-ranking evaluation. */
class RankSpec extends GraftSuite {
  import spark.implicits._

  test("ndcg: one row per label, dcg <= idcg, ndcg in [0,1], mean consistent") {
    val rows = RankQ.qNdcg(spark, sf0001).collect()
    val nLabels = Tables(spark, sf0001).embeddings
      .select($"label").distinct().count()
    assert(rows.length === nLabels)
    rows.foreach { r =>
      val dcg = r.getAs[Double]("dcg"); val idcg = r.getAs[Double]("idcg")
      val nd = r.getAs[Double]("ndcg")
      assert(idcg > 0.0 && dcg <= idcg + 1e-6)
      assert(nd >= 0.0 && nd <= 1.0 + 1e-6)
      assert(math.abs(nd - dcg / idcg) < 1e-4)
    }
    val mean = rows.head.getAs[Double]("mean_ndcg")
    val direct = rows.map(_.getAs[Double]("ndcg")).sum / rows.length
    assert(math.abs(mean - direct) < 1e-4)
  }

  test("mrr: count-based first rank equals a direct sorted-scan recompute") {
    val e = Tables(spark, sf0001).embeddings
    val q = e.groupBy($"label".as("ql")).agg(min($"vec_id").as("q_id"))
      .join(e.select($"vec_id".as("q_id"), $"embedding".as("qv")), "q_id")
    val scored = e.crossJoin(broadcast(q)).filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"ql", $"label", $"vec_id",
        VecFns.cosine($"embedding", $"qv").as("cos"))
      .collect()
    val expected = scored.groupBy(_.getAs[Long]("q_id")).map { case (qid, rs) =>
      val sorted = rs.sortBy(r => (-r.getAs[Double]("cos"), r.getAs[Long]("vec_id")))
      val rank = sorted.indexWhere(r =>
        r.getAs[Int]("label") == r.getAs[Int]("ql")) + 1
      qid -> rank.toLong
    }
    val rows = RankQ.qMrr(spark, sf0001).collect()
    rows.foreach { r =>
      val qid = r.getAs[Long]("q_id")
      assert(r.getAs[Long]("first_rank") === expected(qid),
        s"first_rank mismatch for query $qid")
    }
    val mrr = rows.head.getAs[Double]("mrr")
    val direct = rows.map(r => math.round(1e9 / r.getAs[Long]("first_rank"))).sum /
      1e9 / rows.length
    assert(math.abs(mrr - direct) < 1e-5)
  }

  test("rrf: fused score recomputes from the two rank columns; top-20 ordered") {
    val rows = RankQ.qRrfFusion(spark, sf0001).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val rkc = Option(r.getAs[Any]("rk_cos")).map(_.asInstanceOf[Long])
      val rkl = Option(r.getAs[Any]("rk_l2")).map(_.asInstanceOf[Long])
      assert(rkc.nonEmpty || rkl.nonEmpty)
      rkc.foreach(k => assert(k >= 1 && k <= 100))
      rkl.foreach(k => assert(k >= 1 && k <= 100))
      val e6 = rkc.map(k => math.round(1e6 / (60 + k))).getOrElse(0L) +
        rkl.map(k => math.round(1e6 / (60 + k))).getOrElse(0L)
      assert(math.abs(r.getAs[Double]("rrf") - e6 / 1e6) < 1e-9)
    }
    val scores = rows.map(_.getAs[Double]("rrf"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // a vector ranked #1 by cosine must fuse ahead of one present in
    // neither list; the top fused item carries at least one rank <= 40
    val top = rows.head
    val bestRank = Seq(Option(top.getAs[Any]("rk_cos")), Option(top.getAs[Any]("rk_l2")))
      .flatten.map(_.asInstanceOf[Long]).min
    assert(bestRank <= 40)
  }
}
