package graft

import graft.operators.{SaltedJoin, Sample}
import org.apache.spark.sql.functions._

/** Mixture sampling + sequence packing (training-data assembly). */
class SampleSpec extends GraftSuite {
  import spark.implicits._

  test("stratified sampling is deterministic and hits the target rates") {
    val df = (0 until 4000).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "source")
    val once = Sample.stratified(df, "doc_id", "source", Map("a" -> 0.5, "b" -> 0.1))
    val twice = Sample.stratified(
      df.repartition(7), "doc_id", "source", Map("a" -> 0.5, "b" -> 0.1))
    // identical row set regardless of partitioning
    assert(once.select("doc_id").collect().map(_.getLong(0)).toSet ==
      twice.select("doc_id").collect().map(_.getLong(0)).toSet)
    val bySrc = once.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 2000 candidates per stratum; md5-uniform within ~5 points
    assert(math.abs(bySrc("a") - 1000.0) < 100, s"rate a off: ${bySrc("a")}")
    assert(math.abs(bySrc("b") - 200.0) < 60, s"rate b off: ${bySrc("b")}")
  }

  test("packing fills sequences greedily and starts a new one past the budget") {
    val df = Seq(
      (1L, "g", 300L), (2L, "g", 300L), (3L, "g", 300L), (4L, "g", 50L),
      (10L, "h", 600L), (11L, "h", 10L)
    ).toDF("doc_id", "source", "n")
    val out = Sample.packByGroup(df, "doc_id", "source", col("n"), budget = 512)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // g: cum_before 0,300,600,900 -> seq 0,0,1,1 ; h: 0,600 -> 0,1
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 10L -> 0L, 11L -> 1L))
  }

  test("salted join equals the plain join under a pathological hot key") {
    val hot = (1 to 10000).map(_ => (1L, 1.0)) ++ (1 to 100).map(i => (i.toLong % 50, 2.0))
    val skewed = hot.toDF("k", "v")
    val dim = (0L to 50L).map(k => (k, s"name_$k")).toDF("k", "name")
    val salted = SaltedJoin.inner(skewed, dim, "k", saltFactor = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = skewed.join(dim, "k")
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }
}
