package graft

import org.apache.spark.sql.functions._
import graft.operators.NeighborJaccard
import graft.queries.AuditQ

/** Round-6 wave 2 lake-audit operators: FK-integrity sweep, shard
  * bin-packing (queries/AuditQ.scala) and neighbor-set Jaccard
  * (operators/NeighborJaccard.scala).
  */
class AuditSpec extends GraftSuite {
  import spark.implicits._

  test("fk integrity: the synthetic lake is referentially clean") {
    val out = AuditQ.etlFkIntegrity(spark, sf0001).collect()
    assert(out.length === 7)
    out.foreach { r =>
      assert(r.getLong(3) === 0L, s"${r.getString(0)} has orphans")
      assert(r.getLong(1) > 0L)
    }
  }

  test("fk integrity arithmetic: orphans and null keys count separately") {
    val child = Seq(Some(1L), Some(2L), Some(99L), None).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = child
      .join(parent.select($"pk".as("__pk")).distinct()
        .withColumn("__hit", lit(1)), $"k" === $"__pk", "left")
      .agg(count(lit(1)).as("n"),
        sum(when($"k".isNull, 1L).otherwise(0L)).as("n_null"),
        sum(when($"k".isNotNull && $"__hit".isNull, 1L).otherwise(0L)).as("n_orphan"))
      .collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) === ((4L, 1L, 1L)))
  }

  test("binpack: shards are contiguous, monotone and near the byte target") {
    val out = AuditQ.etlBinpack(spark, sf001).collect()
    // ordered by (source, lang): shard ids never decrease
    val shards = out.map(_.getLong(4)).toSeq
    assert(shards === shards.sorted)
    // every shard except the last holds >= target bytes once closed:
    // first-fit by running total means a shard closes only after
    // crossing the boundary, so per-shard totals stay near 64 KB
    val byShard = out.groupBy(_.getLong(4)).view
      .mapValues(_.map(_.getLong(3)).sum).toMap
    val closed = byShard.keys.toSeq.sorted.dropRight(1)
    closed.foreach { s =>
      assert(byShard(s) >= 65536L / 2, s"shard $s too small: ${byShard(s)}")
      // one oversized file can overflow a shard, but stats rows here
      // are small relative to the target
      assert(byShard(s) <= 65536L * 2, s"shard $s too large: ${byShard(s)}")
    }
    // nothing lost: group count equals the stats-table cardinality
    val nGroups = Tables(spark, sf001).documents
      .select($"source", $"lang").distinct().count()
    assert(out.length.toLong === nGroups)
  }

  test("skew profile: shares and skew factor recompute from raw counts") {
    val rows = AuditQ.qSkewProfile(spark, sf001).collect()
    assert(rows.length === 10)
    val cnt = Tables(spark, sf001).lineitem
      .groupBy($"l_partkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = cnt.values.sum
    val expectedSkew = cnt.values.max.toDouble * cnt.size / total
    // ranked by count desc: the head really is the heaviest key
    assert(rows.head.getLong(1) === cnt.values.max)
    rows.foreach { r =>
      assert(cnt(r.getLong(0)) === r.getLong(1))
      assert(math.abs(r.getDouble(3) - expectedSkew) < 1e-3)
    }
  }

  test("containment flags a quote inside a larger doc that jaccard misses") {
    val frag = "alpha beta gamma delta epsilon zeta eta theta"
    // distinct filler (repeated filler would dedup to 2 shingles and
    // hand jaccard the pair after all)
    val big = (1 to 120).map(i => s"w$i").mkString(" ") + " " + frag
    val fx = Seq((1L, frag), (2L, big), (3L, "unrelated totally different text here"))
      .toDF("doc_id", "text")
    val cont = graft.operators.Dedup
      .containmentPairs(fx, "doc_id", "text", n = 3, tau = 0.8)
      .collect()
    assert(cont.length === 1)
    val r = cont.head
    assert((r.getLong(0), r.getLong(1)) === ((1L, 2L)))
    assert(r.getDouble(3) === 1.0) // every fragment shingle is in the big doc
    // jaccard on the same pair is diluted far below its threshold
    val jac = graft.operators.Dedup
      .ngramJaccardPairs(fx, "doc_id", "text", n = 3, tau = 0.6)
    assert(jac.count() === 0)
  }

  test("neighbor jaccard matches brute force on a fixture") {
    // path + square: 1-2, 2-3, 3-4, 4-1, 1-3 (chord)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("u", "v")
    val got = NeighborJaccard.pairs(edges, "u", "v", minCommon = 1,
        maxMiddleDegree = 64)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(5)))
      .toMap
    // adjacency: 1:{2,4,3} 2:{1,3} 3:{2,4,1} 4:{3,1}
    // common(1,3) = |{2,4}| = 2, union = 3+3-2 = 4
    assert(got((1L, 3L)) === ((2L, 0.5)))
    // common(2,4) = |{1,3}| = 2, union = 2+2-2 = 2
    assert(got((2L, 4L)) === ((2L, 1.0)))
  }

  test("neighbor jaccard: the middle-degree cap prunes generation, not degrees") {
    // hub 0 touches everything; spokes also form one real pair via 9
    val spokes = (1L to 8L).map(i => (0L, i))
    val edges = (spokes ++ Seq((1L, 9L), (2L, 9L))).toDF("u", "v")
    // cap below the hub degree: the 28 spoke pairs the hub generates
    // vanish; only wedges through low-degree middles survive
    val capped = NeighborJaccard.pairs(edges, "u", "v", minCommon = 1,
        maxMiddleDegree = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(5)).toMap
    assert(capped.keySet === Set((1L, 2L), (0L, 9L)))
    // d(1) = {0,9} = 2, d(2) = {0,9} = 2, common = {9} = 1 -> 1/3
    assert(capped((1L, 2L)) === 0.3333)
    // degrees stay FULL-graph even when the hub can't be a middle:
    // common(0,9) = {1,2} = 2, d(0) = 8, d(9) = 2 -> 2/8 = 0.25
    assert(capped((0L, 9L)) === 0.25)
    // without the cap the hub generates all 28 spoke pairs (+ (0,9))
    val full = NeighborJaccard.pairs(edges, "u", "v", minCommon = 1,
        maxMiddleDegree = 64)
    assert(full.count() === 8L * 7 / 2 + 1)
  }
}
