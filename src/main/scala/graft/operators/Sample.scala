package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data mixture operators (SURVEY.md §2.1/§2.5 extensions):
  * deterministic sampling and sequence packing — the two steps between
  * a deduped corpus and a training batch stream.
  */
object Sample {

  /** Per-row uniform in [0, 1e6) derived from the id's md5 — the same
    * content-addressed trick as the train/val/test split: no RNG
    * state, engine-independent, stable under repartition/retry, and a
    * 100 TB mixture rebuild selects the identical rows. Shared
    * (private[graft]) because the first-8-hex mod 1e6 contract is
    * load-bearing for DuckDB-oracle parity everywhere it appears —
    * one definition, one contract (DomainOps.rebalanceToUniform uses
    * it too).
    */
  private[graft] def md5Bucket(idCol: Column): Column =
    pmod(conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(1000000L))

  /** Stratified / mixture sampling: keep each row of stratum s with
    * probability `rates(s)` (default `defaultRate`). This IS the
    * data-mixing step of an LLM pipeline ("2 parts web, 1 part code,
    * 0.1 parts forums"): a narrow, shuffle-free filter — the sampled
    * fraction is exact per stratum up to md5 uniformity.
    */
  def stratified(df: DataFrame, idCol: String, strataCol: String,
                 rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    // thresholds become exact integers BEFORE they reach either
    // engine: rate*1e6 in floating point lands below the integer for
    // rates like 0.3 (299999.99…), and Spark's cast truncates while
    // SQL CAST rounds — pre-rounding in one place removes the
    // cross-engine divergence class entirely
    def threshold(r: Double): Long = math.round(r * 1000000.0)
    val cutoff = rates.foldLeft(lit(threshold(defaultRate))) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(threshold(v))).otherwise(acc)
    }
    df.filter(md5Bucket(col(idCol)) < cutoff)
  }

  /** Importance-weighted deterministic sampling: keep each row with
    * probability `prob` (a per-row column in [0, 1] — e.g. a quality
    * score, so better documents survive proportionally more often).
    * Same md5 content-addressing as [[stratified]]: shuffle-free,
    * retry-stable, and exactly replayable by an oracle. The cutoff is
    * `floor(prob·1e6)` computed in-plan — floor of the same IEEE
    * product on both engines, so no rounding divergence.
    */
  def weighted(df: DataFrame, idCol: String, prob: Column): DataFrame =
    df.filter(md5Bucket(col(idCol)) < floor(prob * lit(1000000.0)))

  /** Greedy contiguous sequence packing: within each `groupCol`
    * shard, documents (ordered by id — deterministic) fill fixed
    * token-budget training sequences; a doc starts a new sequence
    * when the running total crosses the budget. One window per shard
    * (PARTITION BY group) — no global sort, so packing scales with
    * shard count at 100 TB; the window's running sum is the entire
    * cost.
    */
  def packByGroup(df: DataFrame, idCol: String, groupCol: String,
                  nTokens: Column, budget: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), col(groupCol), nTokens.as("n_tokens"))
      .withColumn("seq_id",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / budget).cast("long"))
  }
}
