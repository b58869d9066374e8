package graft

import graft.queries.BasketQ
import org.apache.spark.sql.functions._

/** Round-6 wave 7 — novelty, association rules, diversity. */
class BasketSpec extends GraftSuite {
  import spark.implicits._

  test("text_ngram_novelty bounds and the first-doc-owns-everything base case") {
    val rows = BasketQ.textNgramNovelty(spark, sf0001).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val novelty = r.getDouble(r.fieldIndex("novelty"))
      assert(novelty >= 0.0 && novelty <= 1.0)
      assert(r.getLong(r.fieldIndex("n_novel")) <= r.getLong(r.fieldIndex("n_tri")))
    }
    // The smallest doc_id can never see an earlier occurrence: its
    // novelty is exactly 1 and it must rank in the top block.
    assert(rows.exists(r => r.getDouble(r.fieldIndex("novelty")) == 1.0))
  }

  test("q_basket_rules: confidence and lift reconcile with raw counts") {
    val rows = BasketQ.qBasketRules(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nAb = r.getLong(r.fieldIndex("n_ab"))
      val nA = r.getLong(r.fieldIndex("n_a"))
      val nB = r.getLong(r.fieldIndex("n_b"))
      assert(nAb >= 2 && nAb <= nA && nAb <= nB)
      val conf = r.getDouble(r.fieldIndex("confidence"))
      assert(math.abs(conf - nAb.toDouble / nA) < 1e-12)
      assert(r.getDouble(r.fieldIndex("lift")) > 0)
      assert(r.getLong(r.fieldIndex("part_a")) < r.getLong(r.fieldIndex("part_b")))
    }
  }

  test("corpus_simpson_index stays in [0,1] and exceeds a templated fixture") {
    val rows = BasketQ.corpusSimpsonIndex(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getDouble(r.fieldIndex("diversity"))
      assert(d >= 0.0 && d <= 1.0)
    }
    // A one-token corpus has zero diversity through the same algebra:
    // n tokens all equal -> same_pairs = N(N-1) -> 1 - 1 = 0.
    val one = Seq.fill(5)(("s", "tok")).toDF("source", "token")
      .groupBy($"source", $"token").agg(count(lit(1)).as("n"))
      .groupBy($"source")
      .agg(sum($"n").as("nt"), sum($"n" * ($"n" - 1)).as("sp"))
      .select((lit(1.0) - $"sp".cast("double") /
        ($"nt" * ($"nt" - 1)).cast("double")).as("d"))
      .as[Double].collect()(0)
    assert(one == 0.0)
  }

  test("item recs: cosine reconciles with raw co-occurrence counts") {
    val rows = graft.queries.BasketQ.qItemRecs(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val li = Tables(spark, sf0001).lineitem
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect()
    val perPart = li.groupBy(_._2).map { case (p, xs) => p -> xs.length.toLong }
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { r =>
      val (part, rec, nab) =
        (r.getAs[Long]("part"), r.getAs[Long]("rec"), r.getAs[Long]("n_ab"))
      val expectNab = byOrder.valuesIterator.count(s => s(part) && s(rec)).toLong
      assert(nab === expectNab, s"($part,$rec)")
      val score = nab / math.sqrt(perPart(part).toDouble * perPart(rec))
      assert(math.abs(r.getAs[Double]("score") - score) < 1e-4)
      assert(r.getAs[Long]("rk") >= 1L && r.getAs[Long]("rk") <= 5L)
    }
    // per part, ranks are dense from 1 and scores non-increasing
    rows.groupBy(_.getAs[Long]("part")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).toSeq === (1L to sorted.length))
      val sc = sorted.map(_.getAs[Double]("score"))
      assert(sc.zip(sc.tail).forall { case (a, b) => a >= b - 1e-9 })
    }
  }
}
