package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Block-local union-find matching — the classic entity-resolution
  * blocking-engine shape (dedupe.io / JedAI's "block processing"):
  * candidates never leave their block as a pair STREAM; each block's
  * members run a local incremental union-find where the expensive
  * verifier (threshold Levenshtein) is called ONLY for pairs not
  * already connected within the block, and only the SPANNING edges
  * ship out.
  *
  * Why this is exact for clustering: inside one block the verified
  * pair graph and its spanning forest have identical components by
  * construction, and a cross-block qualifying pair always co-occurs
  * in at least one shared block (blocks ARE the candidate
  * definition), so the union over blocks of local spanning forests
  * has exactly the components of the full verified pair graph. What
  * it does NOT preserve is the pair LIST — use it where the answer
  * is clusters/survivorship (q_golden_record), never where the gate
  * publishes pairs (q_fellegi_sunter keeps the join).
  *
  * Why it scales where the blocked join + filter doesn't: a
  * duplicate family of m members sharing a block costs the join
  * C(m,2) verifier calls and C(m,2) output rows EVERY time, while
  * the local union-find connects most members on their first try —
  * verifier calls collapse toward O(m) on dense families (each new
  * member joins an existing component and every later same-component
  * pair is skipped by find()), and the output is ≤ m−1 edges per
  * block. On the ×100 adversarial entity fixture that's 343M lev
  * calls + 53M CC edges down to ~30M calls + ≤9.7M edges — the two
  * stages EntityProbe measured as the gate's whole cost.
  *
  * 100 TB shape: one exchange keyed by block (the same shuffle the
  * blocked join pays), per-task work bounded by block size (the DF
  * cap bounds blocks), output linear in members. Skewed giant blocks
  * are capped out by the same DF cap that bounds the join plan.
  */
object BlockedMatch {

  /** Exact `lev(a, b) <= k` over Unicode CODE POINTS (the same
    * alphabet Spark's and DuckDB's levenshtein walk), full DP with a
    * length prune and row-min early abandon — at k = 2 most
    * non-matches exit after three rows.
    */
  private[graft] def levWithin(a: String, b: String, k: Int): Boolean = {
    if (a == b) return true
    val ca = a.codePoints.toArray
    val cb = b.codePoints.toArray
    val n = ca.length; val m = cb.length
    if (math.abs(n - m) > k) return false
    var prev = Array.tabulate(m + 1)(identity)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      cur(0) = i
      var rowMin = i
      var j = 1
      while (j <= m) {
        val c =
          if (ca(i - 1) == cb(j - 1)) prev(j - 1)
          else 1 + math.min(prev(j - 1), math.min(prev(j), cur(j - 1)))
        cur(j) = c
        if (c < rowMin) rowMin = c
        j += 1
      }
      if (rowMin > k) return false
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m) <= k
  }

  /** Spanning edges (id_a < id_b) of the per-block verified match
    * graphs. `df` is the exploded blocking frame (one row per
    * (block, member)); `blockCols` values must not contain the 0x01
    * byte (the composite key joins with that separator).
    * Deterministic: members sort by id inside each block, so the
    * emitted forest is a pure function of the block's member set.
    */
  def levSpanningEdges(df: DataFrame, blockCols: Seq[String], idCol: String,
                       strCol: String, maxDist: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(
        concat_ws("\u0001", blockCols.map(c => col(c).cast("string")): _*).as("bk"),
        col(idCol).cast("long").as("id"), col(strCol).as("s"))
      .as[(String, Long, String)]
    keyed.groupByKey(_._1).flatMapGroups { (_, it) =>
      val members = it.map(t => (t._2, t._3)).toArray
      java.util.Arrays.sort(members, Ordering.by((m: (Long, String)) => m._1))
      val m = members.length
      if (m < 2) Iterator.empty
      else {
        val parent = Array.tabulate(m)(identity)
        def find(x: Int): Int = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
          r
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var j = 1
        while (j < m) {
          var i = 0
          while (i < j) {
            val ri = find(i); val rj = find(j)
            if (ri != rj && levWithin(members(i)._2, members(j)._2, maxDist)) {
              parent(ri) = rj
              out += ((members(i)._1, members(j)._1))
            }
            i += 1
          }
          j += 1
        }
        out.iterator
      }
    }.toDF("id_a", "id_b")
  }
}
