package graft

import graft.operators.FuzzyJoin

/** Edit-distance join: trigram blocking must surface known typo pairs
  * and the verify step must bound the distance exactly.
  */
class FuzzyJoinSpec extends GraftSuite {
  import spark.implicits._

  test("typo pairs within the distance bound are found, others excluded") {
    val df = Seq(
      (1L, "warehouse"), (2L, "warehose"),   // dist 1 (deletion)
      (3L, "acme supply co"), (4L, "acme suppply co"), // dist 1 (insertion)
      (5L, "completely different"), (6L, "warehouse logistics") // far from all
    ).toDF("id", "name")
    val got = FuzzyJoin.pairs(df, "id", "name", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 1L), (3L, 4L, 1L)), got.toString)
  }

  test("strings shorter than 3 chars emit no grams and never match") {
    // regression: sequence(1, L-2) DESCENDS for L<3, which used to
    // give "" a gram of "" — pairing all empty strings at distance 0
    val df = Seq((1L, "ab"), (2L, "ab"), (3L, "a"), (4L, ""), (5L, ""))
      .toDF("id", "name")
    assert(FuzzyJoin.pairs(df, "id", "name", maxDist = 2).count() == 0)
  }

  test("the gram DF cap prunes a hot prefix without breaking rare-gram matches") {
    // every name shares the hot "customer#" prefix; the discriminative
    // tail grams still pair the true typo
    val df = (1L to 300L).map(i => (i, f"customer#$i%05d unique$i"))
      .toDF("id", "name")
      .union(Seq((1001L, "customer#00001 unique1x")).toDF("id", "name"))
    val got = FuzzyJoin.pairs(df, "id", "name", maxDist = 2, maxGramDf = 50)
      .filter($"id_a" === 1L || $"id_b" === 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 1001L)), got.toString)
  }
}
