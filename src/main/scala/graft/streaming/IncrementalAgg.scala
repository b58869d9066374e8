package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (streaming) maintenance of a standing aggregate — the
  * `foreachBatch` face of the `q_ivm_agg` gate: each micro-batch
  * aggregates to key-cardinality partials, merges into the persisted
  * state by re-aggregating the union, and the result provably equals
  * a full recompute because counts and integer sums are associative
  * (StreamingSpec pins the equality across micro-batches).
  *
  * Scale shape: the state table is key-cardinality (priorities,
  * days, domains — never rows), each merge touches state + one
  * delta, and history is never re-scanned. At 100 TB this is the
  * difference between a nightly full-lake aggregate job and a
  * delta-sized one.
  */
object IncrementalAgg {

  /** Merges two partial-aggregate tables (same schema: `keys` then
    * summable columns) by summing per key — associative and
    * commutative, so any merge order yields the full aggregate.
    */
  def merge(state: DataFrame, delta: DataFrame,
            keys: Seq[String], sums: Seq[String]): DataFrame = {
    val u = state.unionByName(delta)
    u.groupBy(keys.map(col): _*)
      .agg(sum(col(sums.head)).as(sums.head),
        sums.drop(1).map(c => sum(col(c)).as(c)): _*)
  }
}
