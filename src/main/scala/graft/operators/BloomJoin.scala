package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning — the classic 100 TB semi-join
  * optimization: build an m-bit Bloom bitmap over the small side's
  * keys (one aggregate, buffers merged by OR), broadcast the single
  * bitmap row, and drop probe rows whose k positions aren't all set
  * BEFORE the shuffle/join. False positives survive the filter (and
  * are removed by the real join that follows); false negatives are
  * impossible, so pruning never loses a row.
  *
  * Hashing is the same md5 double-hash scheme as
  * [[graft.functions.SketchAggs.BloomAgg]] — both sides derive
  * positions from `md5(cast(key as string))`, so an external engine
  * replays pass/fail exactly.
  */
object BloomJoin {

  /** h1 / step columns for a key: the two 60-bit md5 halves reduced
    * mod m — computed ONCE per row (md5 + conv, both codegen'd), then
    * shared by all k position probes.
    */
  private def h1Col(keyCol: String, bits: Int): Column =
    expr(s"cast(conv(substr(md5(cast($keyCol as string)), 1, 15), 16, 10) as bigint) % $bits")
  private def stepCol(keyCol: String, bits: Int): Column =
    expr(s"cast(conv(substr(md5(cast($keyCol as string)), 17, 15), 16, 10) as bigint) % ${bits - 1} + 1")

  /** Bitmap membership test given precomputed h1/step columns against
    * `bloomCol` (array<bigint> from [[graft.functions.SketchAggs.bloom]]).
    * The k-term conjunction is unrolled at plan-build time, so every
    * term is a codegen'd bit test over the two shared longs — no
    * interpreted lambda in the hot path.
    */
  private def bitsSet(bloomCol: String, h1: String, step: String,
                      bits: Int, k: Int): Column =
    (0 until k).map { i =>
      expr(
        s"((element_at($bloomCol, cast((($h1 + $i * $step) % $bits) div 64 as int) + 1)" +
          s" >> cast(($h1 + $i * $step) % $bits % 64 as int)) & 1) = 1")
    }.reduce(_ && _)

  /** Prune `probe` down to rows whose `probeKey` might be in
    * `build`'s `buildKey` set, using an m-bit k-hash Bloom filter
    * broadcast as a 1-row join. No shuffle: the aggregate's partial
    * buffers OR together, and the probe side is filtered in place —
    * the pattern that turns a 100 TB shuffle join into a scan +
    * broadcast bitmap + small join.
    */
  def prune(probe: DataFrame, build: DataFrame,
            probeKey: String, buildKey: String,
            bits: Int = 1 << 16, k: Int = 3): DataFrame = {
    val bloom = build.agg(
      graft.functions.SketchAggs.bloom(col(buildKey), bits, k).as("__bloom"))
    probe.crossJoin(broadcast(bloom))
      .withColumn("__h1", h1Col(probeKey, bits))
      .withColumn("__step", stepCol(probeKey, bits))
      .filter(bitsSet("__bloom", "__h1", "__step", bits, k))
      .drop("__bloom", "__h1", "__step")
  }
}
