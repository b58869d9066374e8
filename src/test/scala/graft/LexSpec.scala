package graft

import graft.queries.{AuditQ, LexQ, SequenceQ}
import org.apache.spark.sql.functions._

/** Round-6 wave 5 — lexical profiling, session paths and
  * FD discovery.
  */
class LexSpec extends GraftSuite {
  import spark.implicits._

  test("text_readability levels follow the flesch thresholds") {
    val df = LexQ.textReadability(spark, sf0001)
    val bad = df.filter(
      ($"flesch" >= 70 && $"level" =!= "easy") ||
        ($"flesch" >= 50 && $"flesch" < 70 && $"level" =!= "medium") ||
        ($"flesch" < 50 && $"level" =!= "hard")).count()
    assert(bad == 0)
    assert(df.count() > 0)
  }

  test("corpus_vocab_overlap covers every source pair with jaccard in [0,1]") {
    val df = LexQ.corpusVocabOverlap(spark, sf0001)
    val nSources = Tables(spark, sf0001).documents
      .select($"source").distinct().count()
    assert(df.count() == nSources * (nSources - 1) / 2)
    assert(df.filter($"jaccard" < 0 || $"jaccard" > 1).count() == 0)
    assert(df.filter($"source_a" >= $"source_b").count() == 0)
  }

  test("text_feature_hash buckets stay in [0,64) and weights reconcile") {
    val df = LexQ.textFeatureHash(spark, sf0001)
    assert(df.filter($"bucket" < 0 || $"bucket" > 63).count() == 0)
    val total = df.agg(sum($"weight")).as[Long].collect()(0)
    val toks = Tables(spark, sf0001).documents
      .select(explode(graft.functions.TextFns.toks($"text")).as("t"))
      .filter($"t" =!= "").count()
    assert(total == toks)
  }

  test("q_user_paths emits 10 ranked paths of at most 3 hops") {
    val rows = SequenceQ.qUserPaths(spark, sf0001).collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getString(0).split(">").length <= 3))
    val counts = rows.map(_.getLong(1))
    assert(counts.sorted.reverse.toSeq == counts.toSeq)
  }

  test("etl_fd_discovery finds the known key FDs and rejects a non-FD") {
    val rows = AuditQ.etlFdDiscovery(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getBoolean(r.fieldIndex("holds"))).toMap
    assert(rows(("orders", "o_orderkey", "o_custkey")))
    assert(rows(("nation", "n_nationkey", "n_regionkey")))
    assert(!rows(("orders", "o_orderstatus", "o_orderpriority")))
  }
}
