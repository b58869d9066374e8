package graft

import graft.queries.SpatialQ
import org.apache.spark.sql.functions._

/** Round-7 wave X (queries/SpatialQ.scala): grid-blocked spatial ops. */
class SpatialSpec extends GraftSuite {
  import spark.implicits._

  test("grid join equals the quadratic definition on the real point cloud") {
    val got = SpatialQ.qGridJoin(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force over the same md5-derived points
    val pts = Tables(spark, sf0001).customer.select(
      $"c_custkey".cast("long").as("id"),
      (conv(substring(md5(concat(lit("gx:"), $"c_custkey".cast("string"))), 1, 13), 16, 10)
        .cast("long") % 1000000L).as("x"),
      (conv(substring(md5(concat(lit("gy:"), $"c_custkey".cast("string"))), 1, 13), 16, 10)
        .cast("long") % 1000000L).as("y"))
      .as[(Long, Long, Long)].collect()
    val eps2 = 5000L * 5000L
    val expect = (for {
      (a, xa, ya) <- pts; (b, xb, yb) <- pts if a < b
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) if d2 <= eps2
    } yield (a, b, d2)).toSet
    assert(got === expect)
  }

  test("spatial knn picks the min-(dist2, id) neighbor inside epsilon") {
    val got = SpatialQ.qSpatialKnn(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val pairs = SpatialQ.qGridJoin(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // derive expected NN from the symmetric closure of the pair set
    val nn = (pairs.flatMap { case (a, b, d) => Seq(a -> (d, b), b -> (d, a)) })
      .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).min }
    assert(got.keySet === nn.keySet)
    nn.foreach { case (id, (d, other)) =>
      assert(got(id) === ((other, d)), s"id $id")
    }
  }
}
