package graft.operators

import graft.functions.TextFns._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators over a (id, text) corpus (SURVEY.md §2.3).
  *
  * Scale design: no variant ever cross-joins the corpus. Candidate
  * generation is always an equi-join on a blocking key (content hash /
  * shingle / LSH band / simhash band), so the shuffle volume is
  * O(docs × keys-per-doc) small rows, and exact verification runs only
  * per candidate pair. AQE's skew-join handles hot blocks (e.g. a
  * boilerplate shingle shared by millions of docs at 100 TB; a
  * production run would also cap shingle document-frequency).
  */
object Dedup {

  /** Exact dedup on a key expression: one survivor (min id) per key. */
  def exact(df: DataFrame, idCol: String, key: Column): DataFrame =
    df.groupBy(key.as("__key"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .drop("__key")

  /** Exact n-gram (word shingle) Jaccard pairs >= tau via inverted
    * shingle index: explode distinct shingles, equi-join on shingle,
    * count intersections, join back the set sizes. Exact — suitable
    * as its own DuckDB oracle target.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, tau: Double): DataFrame = {
    // persisted: consumed three times (sizes + both join sides)
    val sh = df.select(col(idCol).as("id"), explode(shingles(col(textCol), n)).as("sh"))
      .persist()
    val sizes = sh.groupBy($("id")).agg(count(lit(1)).as("sz"))
    val inter = sh.as("a").join(sh.as("b"), "sh")
      .filter(col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select($("id").as("id_a"), $("sz").as("sz_a")), "id_a")
      .join(sizes.select($("id").as("id_b"), $("sz").as("sz_b")), "id_b")
      .withColumn("jaccard", col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }
  private def $(s: String): Column = col(s)

  /** MinHash signatures + LSH banding candidates, verified by exact
    * token-set Jaccard. `perms` permutations in `bands` bands of
    * perms/bands rows. Probabilistic recall (tuned ~0.97+ at tau=0.9
    * with 128/16); precision 1.0 after the verify join.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      perms: Int, bands: Int, tau: Double): DataFrame = {
    require(perms % bands == 0,
      s"perms ($perms) must be divisible by bands ($bands) — trailing permutations would be paid for but never banded")
    val rows = perms / bands
    val tok = df.select(col(idCol).as("id"), explode(distinctToks(col(textCol))).as("tok"))
    // native aggregate: one 128-long buffer per doc; the shuffle
    // carries docs, not docs × tokens × perms
    val sig = tok.groupBy($("id"))
      .agg(graft.functions.SketchAggs.minhash($("tok"), perms).as("sig"))
    // band signature: hash of the band's slice of the signature.
    // Persisted: the self-join would otherwise recompute the whole
    // signature pipeline for each side. Deliberately not unpersisted —
    // the operator returns a lazy plan, so release would have to be
    // the caller's post-materialization call; Spark's ContextCleaner
    // reclaims the blocks once the DataFrame is GC'd.
    val bandSigs = sig.select($("id"), posexplode(expr(
      s"transform(sequence(0, ${bands - 1}), b -> " +
        s"xxhash64(array_join(slice(sig, b * $rows + 1, $rows), ',')))")).as(Seq("band", "bsig")))
      .persist()
    val candidates = bandSigs.as("a").join(bandSigs.as("b"), Seq("band", "bsig"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // exact verification on pre-sorted token sets (codegen'd merge
    // intersect — see SortedIntersectSize)
    val sets = df.select(col(idCol).as("id"),
      array_sort(distinctToks(col(textCol))).as("toks")).persist()
    candidates
      .join(sets.select($("id").as("id_a"), $("toks").as("toks_a")), "id_a")
      .join(sets.select($("id").as("id_b"), $("toks").as("toks_b")), "id_b")
      .withColumn("inter",
        graft.functions.SortedIntersectSize($("toks_a"), $("toks_b")).cast("double"))
      .withColumn("jaccard",
        $("inter") / (size($("toks_a")) + size($("toks_b")) - $("inter")))
      .filter($("jaccard") >= tau)
      .select($("id_a"), $("id_b"), round($("jaccard"), 4).as("jaccard"))
  }

  /** 64-bit SimHash per doc: each token hashes to 64 bits; bit b of
    * the signature is the sign of the count-weighted ±1 vote.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), explode(toks(col(textCol))).as("tok"))
      .groupBy($("id"), $("tok")).agg(count(lit(1)).as("w"))
      .groupBy($("id"))
      .agg(graft.functions.SketchAggs.simhash($("tok"), $("w")).as("simhash"))

  /** Near-dup pairs with Hamming distance <= maxDist via band
    * blocking: 4 bands of 16 bits; any pair with <= 3 differing bits
    * is guaranteed caught (pigeonhole), larger distances
    * probabilistically.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxDist: Int): DataFrame = {
    val sigs = simhash(df, idCol, textCol)
    val banded = sigs.select($("id"), $("simhash"),
      posexplode(expr(
        "transform(sequence(0, 3), b -> (simhash >> (b * 16)) & 65535)")).as(Seq("band", "bv")))
    banded.as("a").join(banded.as("b"), Seq("band", "bv"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      .distinct()
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)"))
      .filter($("hamming") <= maxDist)
      .select($("id_a"), $("id_b"), $("hamming").cast("long").as("hamming"))
  }

  /** Embedding-cosine near-dup pairs >= tau. Exact self-join variant
    * (the correctness baseline / oracle target); at 100 TB the
    * candidate set comes from [[graft.operators.Similarity]] LSH
    * buckets instead of the full pairing.
    */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String, tau: Double): DataFrame = {
    import graft.functions.VecFns
    // norms once per vector (O(n)), not per pair (O(n^2))
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      VecFns.norm(col(vecCol)).as("nrm"))
    v.as("a").crossJoin(v.as("b"))
      .filter(col("a.id") < col("b.id"))
      .withColumn("cos", VecFns.cosinePrenormed(
        VecFns.dot(col("a.v"), col("b.v")), col("a.nrm"), col("b.nrm")))
      .filter($("cos") >= tau)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round($("cos"), 4).as("cosine"))
  }
}
