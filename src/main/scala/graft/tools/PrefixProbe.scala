package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-level diagnostic for dedup_prefix_filter's cost (the round-11
  * isolated-tier #1 at ~11.6 s / sf0.1): re-derives the gate's stages
  * with the same recipe and counts/times each — prefix-index size, raw
  * prefix-token matches, matches surviving the PPJoin positional
  * filter, DISTINCT candidates, verified pairs, and full-gate wall
  * time — separating "candidate generation grew" from "the exact
  * verify is output-bound" (the declared design: candidates are
  * linear, the verify constant is the gate's price).
  */
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tau = 0.85
    val docs = graft.Tables(spark, dir).documents

    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prefix] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // the gate's own stages, same recipe (Dedup.prefixFilterPairs,
    // incl. the r12 exact-set collapse: the join runs on one
    // representative per distinct token set)
    val sets0 = Dedup.tokenSets(docs, "doc_id", "text")
      .transform(graft.operators.CacheLedger.persist)
    val nDocs = timed("token sets (count)")(sets0.count())
    val nonEmpty = sets0.filter(size(col("toks")) > 0)
    val groups = nonEmpty.groupBy(col("toks"))
      .agg(min(col("id")).as("rep"))
    val mapped = nonEmpty.join(groups, "toks").select(col("id"), col("rep"))
      .transform(graft.operators.CacheLedger.persist)
    val sets = mapped.filter(col("id") === col("rep")).select(col("id"))
      .join(sets0, "id")
      .transform(graft.operators.CacheLedger.persist)
    val nReps = timed("distinct-set reps (count)")(sets.count())
    val tok = sets.select(col("id"), size(col("toks")).as("n"), explode(col("toks")).as("tok"))
    val dfreq = tok.groupBy(col("tok")).agg(count(lit(1)).as("df_"))
    val prefix = tok.join(dfreq, "tok")
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df_"), col("tok"))))
      .filter(col("pos") <= col("n") - Dedup.ceilTau(col("n"), tau) + 1)
      .select(col("id"), col("n"), col("pos"), col("tok"))
      .transform(graft.operators.CacheLedger.persist)
    val nPrefix = timed("prefix index (count)")(prefix.count())
    val joined = prefix.as("a").join(prefix.as("b"), "tok")
      .filter(col("a.id") < col("b.id") &&
        col("a.n") >= Dedup.ceilTau(col("b.n"), tau) &&
        col("b.n") >= Dedup.ceilTau(col("a.n"), tau))
    val nRaw = timed("raw matches (len-pruned)")(joined.count())
    val num = math.round(tau * 1e6); val den = 1000000L + num
    val pos = joined.filter(
      lit(1L) + least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos")).cast("long")
        >= expr(s"(CAST(a.n + b.n AS BIGINT) * ${num}L + ${den - 1}L) div ${den}L"))
    val nPos = timed("post-positional matches")(pos.count())
    val cands = pos.select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
      .transform(graft.operators.CacheLedger.persist)
    val nCand = timed("distinct candidates")(cands.count())
    val nPairs = timed("exact verify (count)")(
      Dedup.verifyJaccard(cands, sets, tau).count())
    graft.operators.CacheLedger.release()
    val full = timed("FULL gate (cold ledger)")(
      Dedup.prefixFilterPairs(docs, "doc_id", "text", tau).count())
    println(s"""{"metric":"prefix_probe","dir":"$dir","docs":$nDocs,"distinct_set_reps":$nReps,""" +
      s""""prefix_rows":$nPrefix,""" +
      s""""raw_matches":$nRaw,"post_positional":$nPos,"candidates":$nCand,""" +
      s""""rep_pairs":$nPairs,"full_gate_pairs":$full}""")
    spark.stop()
  }
}
