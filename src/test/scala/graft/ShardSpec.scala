package graft

import graft.etl.TableDigest
import graft.queries.ShardQ
import org.apache.spark.sql.functions._

/** Round-7 sharding/integrity wave (queries/ShardQ.scala). */
class ShardSpec extends GraftSuite {
  import spark.implicits._

  test("rendezvous growth moves exactly the new shard's winners") {
    val rows = ShardQ.etlRendezvousShard(spark, sf0001).collect()
    val docs = Tables(spark, sf0001).documents.count()
    assert(rows.map(_.getAs[Long]("n_at_5")).sum === docs)
    rows.foreach { r =>
      // HRW guarantee: a doc moves iff the NEW shard wins it — shards
      // 0..3 keep every doc they already had
      if (r.getAs[Long]("shard") < 4) assert(r.getAs[Long]("arrived") === 0L)
      else assert(r.getAs[Long]("arrived") === r.getAs[Long]("n_at_5"))
    }
    val share = rows.head.getAs[Double]("moved_share")
    assert(share > 0.05 && share < 0.4) // ≈1/5 by design
  }

  test("partition digests fold to the whole-table digest") {
    val parts = ShardQ.etlPartitionDigest(spark, sf0001).collect()
    val whole = TableDigest.digest(
      Tables(spark, sf0001).orders, "orders",
      Seq($"o_orderkey", $"o_custkey", $"o_orderstatus",
        round($"o_totalprice" * 100).cast("long"),
        unix_micros($"o_orderdate".cast("timestamp")),
        $"o_orderpriority")).collect().head
    assert(parts.map(_.getAs[Long]("n_rows")).sum === whole.getAs[Long]("n_rows"))
    assert(parts.map(_.getAs[Long]("xor_digest")).reduce(_ ^ _) ===
      whole.getAs[Long]("xor_digest"))
  }

  test("pacf lag 1 equals acf lag 1 and all values are bounded") {
    val rows = ShardQ.tsPacf(spark, sf0001).orderBy($"lag").collect()
    assert(rows.length === 7)
    rows.foreach(r => assert(math.abs(r.getAs[Double]("pacf")) <= 1.0 + 1e-9))
    val daily = Tables(spark, sf0001).events
      .filter($"event_type" === "purchase")
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(round($"value" * 100).cast("long")).as("cents"))
    val rho1 = daily.as("a")
      .join(daily.as("b"), expr("b.day = a.day - 1"))
      .agg(round(corr($"a.cents", $"b.cents"), 4)).collect().head.getDouble(0)
    assert(rows.head.getAs[Double]("pacf") === rho1)
  }
}
