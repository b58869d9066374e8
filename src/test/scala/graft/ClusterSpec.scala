package graft

import graft.operators.ClusterDedup

class ClusterSpec extends GraftSuite {
  import spark.implicits._

  test("connected components merge transitive chains to min id") {
    // components: {1,2,3,4} via chain, {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val got = ClusterDedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("maxIter bounds the propagation loop") {
    val chain = (1L to 30L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("id_a", "id_b")
    val got = ClusterDedup.connectedComponents(chain, maxIter = 3).collect()
    assert(got.nonEmpty) // bounded, returns possibly-unconverged labels
  }

  test("50-node chain converges within the default budget (pointer jumping + checkpoint)") {
    // worst-case diameter graph: plain min-propagation needs ~50
    // rounds (> default maxIter); pointer jumping halves label depth
    // per round, and periodic localCheckpoint keeps the plan shallow
    val chain = (1L to 50L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("id_a", "id_b")
    val got = ClusterDedup.connectedComponents(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 50 && got.values.forall(_ == 1L),
      s"unconverged labels: ${got.filter(_._2 != 1L).take(5)}")
  }
}
