package graft

import graft.operators.TopK
import org.apache.spark.sql.functions._

/** The optimizer rule must transparently turn the hand-written
  * row_number-filter formulation into the custom GroupTopK operator
  * without changing results.
  */
class RewriteTopKSpec extends GraftSuite {
  import spark.implicits._

  test("row_number <= k window pattern rewrites to GroupTopK") {
    val plan = TopK(Tables(spark, sf0001).part,
      Seq($"p_brand"), Seq($"p_retailprice".desc, $"p_partkey"), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GroupTopK"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("Window"), s"Window survived the rewrite:\n$plan")
  }

  test("rewritten plan returns identical results to a no-extensions run") {
    // expected values computed relationally (groupBy max etc. would
    // lose ties); derive via sorted collect per group instead
    val part = Tables(spark, sf0001).part
      .select($"p_brand", $"p_partkey", $"p_retailprice").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val expected = part.groupBy(_._1).toSeq.flatMap { case (b, rows) =>
      rows.sortBy(r => (-r._3, r._2)).take(3).zipWithIndex
        .map { case ((_, pk, _), i) => (b, pk, i + 1) }.toSeq
    }.toSet
    val got = TopK(Tables(spark, sf0001).part,
      Seq($"p_brand"), Seq($"p_retailprice".desc, $"p_partkey"), 3)
      .select($"p_brand", $"p_partkey", $"rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected)
  }

  test("global top-n (no PARTITION BY) rewrites to partial+final GroupTopK") {
    // regression: this shape used to crash at planning time with
    // ClusteredDistribution(Nil) once GraftExtensions was injected
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"p_retailprice".desc, $"p_partkey")
    val df = Tables(spark, sf0001).part
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GroupTopK"), s"global rewrite did not fire:\n$plan")
    assert(!plan.contains("Window"), s"Window survived the global rewrite:\n$plan")
    val got = df.select($"p_partkey", $"rn").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._2).toSeq
    val expected = Tables(spark, sf0001).part
      .select($"p_partkey", $"p_retailprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy(r => (-r._2, r._1)).take(5).zipWithIndex
      .map { case ((pk, _), i) => (pk, i + 1) }.toSeq
    assert(got == expected)
  }

  test("non-matching shapes keep the Window plan (conservative rewrite)") {
    // rank() instead of row_number: must NOT rewrite
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"p_brand").orderBy($"p_retailprice".desc)
    val plan = Tables(spark, sf0001).part
      .withColumn("rk", rank().over(w)).filter($"rk" <= 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"rank() should not rewrite:\n$plan")
    // rn used without a k-filter: must NOT rewrite
    val plan2 = Tables(spark, sf0001).part
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"p_brand").orderBy($"p_partkey")))
      .filter($"p_size" > 10)
      .queryExecution.executedPlan.toString
    assert(plan2.contains("Window"), s"unrelated filter should not rewrite:\n$plan2")
  }
}
