package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (fuzzy) self-join for record linkage (SURVEY.md
  * §2.2 extension): find string pairs with Levenshtein distance
  * ≤ maxDist without an all-pairs comparison.
  *
  * Candidate generation is the q-gram trick: strings within k edits
  * share a character trigram once they're long enough (k edits destroy
  * at most 3k of the L−2 trigrams), so an equi-join on trigrams —
  * document-frequency-capped like the shingle index, since a gram
  * shared by m strings emits m²/2 rows — bounds the verify set, and
  * Spark's codegen'd levenshtein() scores only candidates. Recall
  * contract: pairs sharing no sub-cap trigram are not emitted (short
  * strings / hot-gram-only overlap); the gate's oracle replicates the
  * blocking, so the result is exact BY CONSTRUCTION for the published
  * algorithm, and the spec pins known-typo fixtures.
  */
object FuzzyJoin {

  /** Distinct character trigrams, positions 1..L−2. Strings shorter
    * than 3 produce NONE and never match (mirrored by the oracle's
    * `range(1, L-1)`) — the length guard is load-bearing: Spark's
    * `sequence(1, stop)` counts DOWN when stop < 1, so without it an
    * empty string emits a "" gram and every empty pair would match at
    * distance 0.
    */
  private def trigrams(c: Column): Column =
    when(length(c) >= 3,
      array_distinct(transform(sequence(lit(1), length(c) - 2), i => c.substr(i, lit(3)))))
      .otherwise(array().cast("array<string>"))

  def pairs(df: DataFrame, idCol: String, strCol: String,
            maxDist: Int, maxGramDf: Long = 200): DataFrame = {
    // persisted: df-count + both self-join sides
    val g = df.select(col(idCol).as("id"), col(strCol).as("s"),
      explode(trigrams(col(strCol))).as("gram")).transform(CacheLedger.persist)
    val rare = g.join(
      g.groupBy(col("gram")).agg(count(lit(1)).as("df_"))
        .filter(col("df_") <= maxGramDf).select(col("gram")),
      "gram")
    val candidates = rare.as("a").join(rare.as("b"), "gram")
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("a.s").as("s_a"),
        col("b.id").as("id_b"), col("b.s").as("s_b"))
      .distinct()
    // threshold form (r15): banded O(len·maxDist) DP with early
    // abandon, -1 past the bound — surviving rows carry the exact
    // distance, so `>= 0` is bit-identical to `lev <= maxDist`
    candidates
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

}
