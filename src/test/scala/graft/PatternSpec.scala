package graft

import graft.queries.PatternQ
import org.apache.spark.sql.functions._

/** Round-7 pattern wave (queries/PatternQ.scala). */
class PatternSpec extends GraftSuite {
  import spark.implicits._

  test("bpe pair counts: every pair is 2 symbols and ends-of-word appear") {
    val rows = PatternQ.textBpePairs(spark, sf0001).collect()
    assert(rows.length === 20)
    assert(rows.forall(_.getAs[String]("pair").length == 2))
    // the sentinel shows up among top pairs of any natural vocabulary
    assert(rows.exists(_.getAs[String]("pair").endsWith("#")))
    val ns = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (hi, lo) => hi >= lo })
  }

  test("langid confusion matrix reconciles to the corpus and bounds shares") {
    val rows = PatternQ.corpusLangidEval(spark, sf0001).collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total === Tables(spark, sf0001).documents.count())
    rows.foreach { r =>
      val share = r.getAs[Double]("share_of_true")
      assert(share > 0.0 && share <= 1.0)
      assert(r.getAs[Long]("n") <= r.getAs[Long]("n_true"))
    }
  }

  test("streak islands are genuine consecutive runs") {
    val rows = PatternQ.qStreaks(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val len = r.getAs[Long]("longest_streak")
      assert(r.getAs[Long]("end_day") - r.getAs[Long]("start_day") === len - 1)
      assert(len <= r.getAs[Long]("n_active_days"))
    }
  }

  test("hampel emits only full frames and flags match the rule") {
    val rows = PatternQ.tsHampel(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lhs = math.abs(r.getAs[Long]("cents") - r.getAs[Long]("med")) * 10000
      val rhs = r.getAs[Long]("mad") * 3 * 14826
      assert(r.getAs[Boolean]("is_outlier") === (lhs > rhs))
    }
  }

  test("srm: the 50/50 split accounting covers every user") {
    val r = PatternQ.qSrmCheck(spark, sf0001).collect().head
    val users = Tables(spark, sf0001).events.select($"user_id").distinct().count()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") === users)
    assert(r.getAs[Double]("chi2") >= 0.0)
  }

  test("window funnel: stages recount from a driver-side strict-order replay") {
    val rows = PatternQ.qWindowFunnel(spark, sf0001).collect()
      .map(r => r.getAs[Long]("stage") -> r.getAs[Long]("n_users")).toMap
    val ev = Tables(spark, sf0001).events
      .select($"user_id", $"event_type", unix_micros($"ts"))
      .as[(Long, String, Long)].collect()
    val win = 86400000000L
    val expected = ev.groupBy(_._1).values.map { es =>
      val s1 = es.filter(_._2 == "signup").map(_._3).minOption
      val s2 = s1.flatMap(a => es.filter(e => e._2 == "click" && e._3 > a && e._3 <= a + win)
        .map(_._3).minOption)
      val s3 = (s1, s2) match {
        case (Some(a), Some(b)) =>
          es.filter(e => e._2 == "purchase" && e._3 > b && e._3 <= a + win)
            .map(_._3).minOption
        case _ => None
      }
      Seq(s1, s2, s3).count(_.isDefined).toLong
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(rows === expected.filter(_._2 > 0))
    // events coverage: stage counts sum to the user universe
    assert(rows.values.sum === ev.map(_._1).distinct.length.toLong)
  }
}
