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
}
