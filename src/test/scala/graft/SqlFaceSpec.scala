package graft

import graft.queries.SqlFaceQ
import org.apache.spark.sql.functions._

/** Round-7 API-surface wave (queries/SqlFaceQ.scala). */
class SqlFaceSpec extends GraftSuite {
  import spark.implicits._

  test("native expressions resolve through the SQL face with sane outputs") {
    val rows = SqlFaceQ.qSqlExtensions(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("common_tokens") >= 0)
      assert(r.getAs[Int]("n_trigrams") >= 0)
    }
  }

  test("broadcast and shuffle-hash hints agree exactly and actually diverge in strategy") {
    val df = SqlFaceQ.qJoinHints(spark, sf0001)
    df.collect().foreach { r =>
      assert(r.getAs[Long]("n_broadcast") === r.getAs[Long]("n_shuffle"))
      assert(r.getAs[Long]("cents_broadcast") === r.getAs[Long]("cents_shuffle"))
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(plan.contains("ShuffledHashJoin"))
  }

  test("decimal and integer-cents money paths agree on every group") {
    val rows = SqlFaceQ.qDecimalMoney(spark, sf0001).collect()
    assert(rows.length === 5)
    rows.foreach(r => assert(r.getAs[Boolean]("paths_agree")))
  }
}
