package graft

import graft.operators.Dedup
import graft.functions.TextFns
import org.apache.spark.sql.functions._

class DedupSpec extends GraftSuite {
  import spark.implicits._

  private lazy val docs = Tables(spark, sf0001).documents

  test("exact dedup collapses true duplicates") {
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y")).toDF("doc_id", "text")
    val out = Dedup.exact(df, "doc_id", md5($"text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 3L -> 1L))
  }

  test("normalized dedup collapses case/punct/whitespace variants") {
    val df = Seq((1L, "Hello,  World!"), (2L, "hello world"), (3L, "different")).toDF("doc_id", "text")
    val out = Dedup.exact(df, "doc_id", md5(TextFns.normalized($"text")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 3L -> 1L))
  }

  test("minhash-LSH recall >= 0.9 and precision 1.0 vs exact jaccard pairs") {
    val exact = docs.select($"doc_id".as("id"), TextFns.distinctToks($"text").as("toks"))
    val truth = exact.as("a").crossJoin(exact.as("b"))
      .filter(col("a.id") < col("b.id"))
      .withColumn("inter", size(array_intersect(col("a.toks"), col("b.toks"))).cast("double"))
      .withColumn("j", col("inter") / (size(col("a.toks")) + size(col("b.toks")) - col("inter")))
      .filter(col("j") >= 0.9)
      .select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Dedup.minhashLshPairs(docs, "doc_id", "text", perms = 128, bands = 16, tau = 0.9)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(truth), "post-verify precision must be 1.0")
    assert(truth.nonEmpty && got.size.toDouble / truth.size >= 0.9,
      s"recall ${got.size}/${truth.size}")
  }

  test("minhash cluster output equals the components of the pair graph, with linear edges") {
    // cluster semantics: connected components of the shares-a-band
    // relation. The pair gate's candidate stage IS that relation, so
    // pointer-jumped star clusters must equal components of the
    // (unverified) candidate pair graph — on any corpus, including the
    // adversarial templated-family one where the pair OUTPUT is
    // quadratic and the star stays linear.
    val cands = Dedup.lshCandidates(docs, "doc_id", "text", perms = 128, bands = 16)
    val fromPairs = graft.operators.ClusterDedup.connectedComponents(cands)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fromStars = Dedup.minhashClusters(docs, "doc_id", "text", perms = 128, bands = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fromStars == fromPairs,
      "star-edge components must equal pair-graph components")
    assert(fromStars.nonEmpty)
    // every verified near-dup pair lands in one cluster (band sharing
    // is exactly how those pairs were generated)
    val verified = Dedup.minhashLshPairs(docs, "doc_id", "text", 128, 16, tau = 0.9)
      .select($"id_a", $"id_b").collect()
    verified.foreach { r =>
      assert(fromStars(r.getLong(0)) == fromStars(r.getLong(1)))
    }
  }

  test("simhash is deterministic and identical docs collide at hamming 0") {
    val df = Seq((1L, "spark query engine"), (2L, "spark query engine"), (3L, "totally other words here"))
      .toDF("doc_id", "text")
    val sigs = Dedup.simhash(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    val pairs = Dedup.simhashPairs(df, "doc_id", "text", maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0L)))
  }

  test("LSH embedding pairs: precision 1.0, recall >= 0.95 vs the exact O(n^2) variant") {
    val emb = Tables(spark, sf001).embeddings
    val exact = Dedup.embeddingPairs(emb, "vec_id", "embedding", tau = 0.45)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingPairsLsh(emb, "vec_id", "embedding", tau = 0.45)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "exact-cosine verify must make precision 1.0")
    assert(exact.nonEmpty && lsh.size.toDouble / exact.size >= 0.95,
      s"recall ${lsh.size}/${exact.size}")
  }

  test("shingle DF cap prunes boilerplate candidates without losing real pairs") {
    // 200 docs all sharing one hot boilerplate line, in 100 true
    // near-dup pairs distinguished by their tails
    val hot = "subscribe to our newsletter terms of service apply all rights reserved"
    val docs = (0 until 200).map { i =>
      val pairTag = i / 2 // docs 2k and 2k+1 are near-dups
      (i.toLong, s"$hot unique tail $pairTag ${"filler " * 3}common run ${i % 2}")
    }.toDF("doc_id", "text")
    val sets = docs.select($"doc_id".as("id"),
      array_sort(TextFns.shingles($"text", 3)).as("shs")).persist()
    // uncapped: the hot shingles alone pair every doc with every other
    val uncapped = Dedup.ngramCandidates(sets, maxShingleDf = Long.MaxValue).count()
    val capped = Dedup.ngramCandidates(sets, maxShingleDf = 50).count()
    assert(uncapped == 200L * 199 / 2, s"fixture should all-pair uncapped, got $uncapped")
    assert(capped < uncapped / 10, s"cap failed to prune: $capped vs $uncapped")
    // the prefix-filter pipeline (r16 — hot shingles never enter a
    // prefix, so the same boilerplate self-regulates without a cap)
    // still finds every true near-dup pair exactly
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, tau = 0.6)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truePairs = (0 until 100).map(k => (2L * k, 2L * k + 1)).toSet
    assert(truePairs.subsetOf(pairs), s"missing ${(truePairs -- pairs).take(5)}")
    sets.unpersist()
  }

  test("exact-set collapse: jaccard pairs match brute force and cluster " +
    "edges give identical components with linear edge count") {
    // fixture: two exact-duplicate families (identical text — identical
    // shingle sets after the collapse's array_sort), a near-dup bridge
    // between the families' texts, a singleton near-dup of family A,
    // an unrelated doc, and two empty docs (empty ⇒ single '' shingle
    // — pairs at J=1.0 like the all-pairs oracle would)
    val famA = "spark shuffles the exchange operator hash partitions every row by key"
    val famB = "spark shuffles the exchange operator hash partitions every row by key twice"
    val docs = (
      (0L to 3L).map(i => (i, famA)) ++            // family A: 4 exact copies
      (10L to 12L).map(i => (i, famB)) ++          // family B: 3 exact copies
      Seq((20L, famA + " extra"),                  // singleton near-dup of A
          (30L, "completely different words about unrelated ideas entirely"),
          (40L, ""), (41L, ""))                    // empty family
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, tau = 0.6)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // brute-force truth, driver-side, same shingle definition
    val shs = docs.select($"doc_id", TextFns.shingles($"text", 3).as("shs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    val truth = (for {
      (ia, sa) <- shs; (ib, sb) <- shs
      if ia < ib && sa.nonEmpty && sb.nonEmpty
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= 0.6
    } yield (ia, ib) -> math.round(j * 1e4) / 1e4).toMap
    assert(got == truth, s"missing=${(truth.keySet -- got.keySet).take(5)} " +
      s"extra=${(got.keySet -- truth.keySet).take(5)}")
    // cluster edges: identical components, linear (not clique) edges
    val edges = Dedup.ngramJaccardClusterEdges(docs, "doc_id", "text", n = 3, tau = 0.6)
    val ccPairs = graft.operators.ClusterDedup.connectedComponents(
      pairs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ccEdges = graft.operators.ClusterDedup.connectedComponents(
      edges).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ccEdges == ccPairs,
      "star + rep-pair components must equal full pair-graph components")
    assert(edges.count() < pairs.count(),
      "edge list must be smaller than the clique pair graph on dup families")
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val rows = Dedup.embeddingPairs(Tables(spark, sf0001).embeddings,
      "vec_id", "embedding", tau = 0.45).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.45)
    }
  }

  test("incremental dedup tiers: exact digest, token-permuted near, new") {
    val index = Seq(
      (1L, "The quick brown fox jumps over the lazy dog"),
      (2L, "completely different corpus content here"),
      (7L, "the QUICK brown fox... jumps over the lazy dog!")) // normalizes to id 1's digest
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick BROWN fox jumps over the lazy dog?"), // dup_exact after normalization
      (11L, "dog lazy the over jumps fox brown quick the"),  // permuted: same token set -> dup_near
      (12L, "entirely novel text never seen before"))        // new
      .toDF("doc_id", "text")
    val got = Dedup.incremental(index, batch, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(10L) == (("dup_exact", 1L)))
    assert(got(11L) == (("dup_near", 1L)))
    assert(got(12L) == (("new", -1L)))
  }

  test("bloom-pruned incremental dedup is row-identical to the plain plan") {
    val docs = Tables(spark, sf0001).documents
    val index = docs.filter($"doc_id" % 5 =!= 0)
    val batch = docs.filter($"doc_id" % 5 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val plain = rows(Dedup.incremental(index, batch, "doc_id", "text"))
    val bloom = rows(Dedup.incrementalBloom(index, batch, "doc_id", "text"))
    assert(plain == bloom)
    assert(plain.nonEmpty)
  }

  test("semantic dedup: fixture clusters flag near-copies against the min id") {
    // seeds (ids 0, 1) point along orthogonal axes; 10/11 are scaled
    // copies (cosine 1 with their seed), 12 is a noisy copy of seed 0,
    // 13 is oblique enough to clear cluster assignment but miss tau
    val vecs = Seq(
      0L -> Array(1f, 0f, 0f, 0f),
      1L -> Array(0f, 1f, 0f, 0f),
      10L -> Array(2f, 0f, 0f, 0f),
      11L -> Array(0f, 3f, 0f, 0f),
      12L -> Array(0.9f, 0.1f, 0f, 0f),
      13L -> Array(0.3f, 0f, 0.95f, 0f))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Dedup.semantic(df, "vec_id", "embedding", tau = 0.9, numCentroids = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(3))))
      .toMap
    assert(got(0L) === ((0L, None, false)))      // cluster representative
    assert(got(10L) === ((0L, Some(0L), true)))  // exact-direction copy
    assert(got(12L) === ((0L, Some(0L), true)))  // noisy copy, cos ≈ 0.994
    assert(got(11L) === ((1L, Some(1L), true)))
    assert(got(1L) === ((1L, None, false)))
    assert(got(13L)._1 === 0L && !got(13L)._3)   // same cluster, below tau
  }

  test("minhash eval counts reconcile with the pair gate and the truth set") {
    val r = graft.queries.DedupQ.dedupMinhashEval(spark, sf0001).collect().head
    val (cand, ver, truth) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(ver <= cand, "verified pairs must be a subset of candidates")
    assert(ver <= truth, "verified pairs are exact-jaccard matches, so <= truth")
    // the verified set IS the pair gate's output restricted to the
    // md5-addressed eval slice (both endpoints sampled); the modulus
    // scales with corpus size so the slice is BOUNDED (~2500 docs) —
    // at sf0.001's 500 docs it is 1, i.e. the whole corpus
    val nDocs = Tables(spark, sf0001).documents.count()
    val evalMod = math.max(1L, math.ceil(nDocs / 2500.0).toLong)
    def inSlice(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"mheval:$id".getBytes).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.take(13), 16) % evalMod == 0
    }
    val gate = graft.queries.DedupQ.dedupMinhashLsh(spark, sf0001).collect()
      .count(r => inSlice(r.getLong(0)) && inSlice(r.getLong(1)))
    assert(gate == ver)
    // 128/16 banding at tau=0.9 should not miss more than a few percent
    assert(truth == 0 || ver.toDouble / truth >= 0.9,
      s"LSH recall collapsed: $ver / $truth")
  }

  test("semantic dedup flags exactly the same-cluster exact pairs") {
    val emb = Tables(spark, sf0001).embeddings
    val out = Dedup.semantic(emb, "vec_id", "embedding", tau = 0.45)
    val clusters = out.select($"id", $"cluster")
    // ground truth: exact all-pairs cosine, restricted to same cluster
    val exact = Dedup.embeddingPairs(emb, "vec_id", "embedding", tau = 0.45)
      .join(clusters.select($"id".as("id_a"), $"cluster".as("ca")), "id_a")
      .join(clusters.select($"id".as("id_b"), $"cluster".as("cb")), "id_b")
      .filter($"ca" === $"cb")
    val expect = exact.groupBy($"id_b".as("id")).agg(min($"id_a").as("dup_of"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = out.filter($"is_dup").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("lshContaminated flags near-copies of benchmark docs, never benchmark rows") {
    // ids divisible by 20 are "benchmark"; doc 21 is a near-copy of
    // bench doc 20 (one token changed of twelve), doc 22 is unrelated
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val df = Seq(
      (20L, base),
      (21L, base.replace("mu", "nu")),
      (22L, "completely different words with no overlap whatsoever here at all"),
      (40L, "another benchmark document about unrelated topics entirely"))
      .toDF("doc_id", "text")
    val out = Dedup.lshContaminated(df, "doc_id", "text",
      isBench = id => id % 20 === 0, perms = 128, bands = 16, tau = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bench_hits"), r.getAs[Long]("first_bench_id"))).toMap
    assert(out.contains(21L), "near-copy must flag")
    assert(out(21L)._2 === 20L)
    assert(!out.contains(22L), "unrelated doc must not flag")
    assert(!out.contains(20L) && !out.contains(40L), "benchmark rows are never flagged")
  }

  test("release() frees every intermediate a dedup run persisted") {
    spark.catalog.clearCache() // isolate from earlier suites' caches
    val before = spark.sparkContext.getPersistentRDDs.size
    // materialize two cache-pinning operators (minhash: bandSigs +
    // tokenSets; embedding LSH: the signature table)
    Dedup.minhashLshPairs(docs, "doc_id", "text", perms = 128, bands = 16, tau = 0.9).count()
    Dedup.embeddingPairsLsh(Tables(spark, sf0001).embeddings, "vec_id", "embedding", 0.45).count()
    assert(spark.sparkContext.getPersistentRDDs.size > before,
      "operators should have pinned intermediates while running")
    Dedup.release()
    assert(spark.sparkContext.getPersistentRDDs.size <= before,
      "release() must unpersist every ledger entry")
  }

  test("prefix-filter pairs equal the all-pairs truth (lossless candidates)") {
    val exact = docs.select($"doc_id".as("id"), TextFns.distinctToks($"text").as("toks"))
    val truth = exact.as("a").crossJoin(exact.as("b"))
      .filter(col("a.id") < col("b.id"))
      .withColumn("inter", size(array_intersect(col("a.toks"), col("b.toks"))).cast("double"))
      .withColumn("j", col("inter") / (size(col("a.toks")) + size(col("b.toks")) - col("inter")))
      .filter(col("j") >= 0.85)
      .select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Dedup.prefixFilterPairs(docs, "doc_id", "text", tau = 0.85)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture must contain near-dup pairs")
    assert(got == truth, s"prefix filter must be LOSSLESS: missing ${(truth -- got).take(3)}, extra ${(got -- truth).take(3)}")
  }

  test("substring coverage catches a SHIFTED copied run that chunk dedup misses") {
    // doc 2 embeds doc 1's 24-token run at offset 1 — every 80-aligned
    // chunk hash differs, but stride-1 windows share 5 window sites
    val run = (1 to 24).map(i => s"tok$i").mkString(" ")
    val df = Seq(
      (1L, run + " " + (1 to 60).map(i => s"pad$i").mkString(" ")),
      (2L, "shift " + run + " " + (1 to 60).map(i => s"alt$i").mkString(" ")),
      (3L, (1 to 40).map(i => s"uniq$i").mkString(" "))).toDF("doc_id", "text")
    val out = Dedup.substringCoverage(df, "doc_id", "text", w = 20)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    // 24-token shared run ⇒ 5 windows per doc, interval-union = 24 tokens
    assert(out(1L) == (5L, 24L), s"doc 1 got ${out(1L)}")
    assert(out(2L) == (5L, 24L), s"doc 2 got ${out(2L)}")
    assert(out(3L) == (0L, 0L), "unique doc must carry no dup mass")
    val chunk = graft.queries.DedupQ.chunkDedup(df)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(chunk.values.forall(_ == 0L),
      "aligned chunks must miss the shifted copy (that's the gap this operator closes)")
  }

  test("substring coverage merges overlapping dup windows: never exceeds n_tokens") {
    // doc 2 is an exact copy of doc 1 — every window duplicated, and
    // the interval union must clamp to the doc length, not 20×windows
    val body = (1 to 50).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, body), (2L, body)).toDF("doc_id", "text")
    val rows = Dedup.substringCoverage(df, "doc_id", "text", w = 20).collect()
    rows.foreach { r =>
      assert(r.getLong(3) == 31L, "50 tokens ⇒ 31 stride-1 windows, all duplicated")
      assert(r.getLong(4) == 50L, "union of overlapping spans = whole doc")
      assert(r.getDouble(5) == 1.0)
    }
  }
}
