package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigating salted join (SURVEY.md §5).
  *
  * When one join key carries a disproportionate share of rows (the
  * classic hot-key problem at 100 TB), the plain shuffle sends the
  * whole hot partition to one task. Salting splits each key into
  * `saltFactor` sub-keys: the skewed side gets a pseudo-random salt,
  * the other side is replicated `saltFactor` times, and the join key
  * becomes (key, salt) — spreading the hot key over `saltFactor`
  * tasks at the cost of replicating the small side.
  *
  * AQE's skew-join handles moderate skew automatically; explicit
  * salting is for the pathological single-key case AQE can't split
  * (e.g. one key = 30% of the table). Result equality with the plain
  * join is independent of salt values (spec-asserted).
  */
object SaltedJoin {

  def inner(skewed: DataFrame, other: DataFrame, key: String, saltFactor: Int): DataFrame = {
    // salt from the row's own columns, NOT monotonically_increasing_id:
    // a task retry or AQE re-plan recomputes the same salt for the same
    // row, so the shuffle stays deterministic (the id-based variant can
    // lose/duplicate rows when surviving map outputs mix with retried
    // ones)
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.map(col): _*), lit(saltFactor.toLong)))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
