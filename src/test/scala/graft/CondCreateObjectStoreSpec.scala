package graft

import graft.etl.{CommitLog, ConditionalCreate, ConditionalCreateAtomicPut}
import graft.testfs.CondCreateSimFileSystem
import org.apache.hadoop.fs.Path

/** S3-semantics proof #2: the full [[ObjectStoreContractSuite]]
  * against `ccsim://` — the S3A-shaped PUBLIC surface (Hadoop ≥ 3.4.1
  * conditional create advertised via path capability, NO
  * [[graft.etl.AtomicPut]] anywhere in the store). Every commit claim
  * here can only have gone through [[ConditionalCreateAtomicPut]], the
  * adapter a real `s3a://` bucket with `fs.s3a.create.conditional
  * .enabled` takes — so green is the real-scheme adapter proof, run
  * over the same contract as the direct-AtomicPut store.
  */
class CondCreateObjectStoreSpec extends ObjectStoreContractSuite {

  CondCreateSimFileSystem.register(spark)

  override def schemeName: String = "ccsim"
  override def claimCount(): Int = CondCreateSimFileSystem.conditionalCreates.get()

  private def bytes(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("the ccsim store models the S3A public surface: no exclusive create, capability-advertised conditional create") {
    val root = tmpUri("graft_ccsem")
    val f = hfs(root)
    assert(f.isInstanceOf[CondCreateSimFileSystem])
    // NOT an AtomicPut — nothing in graft's own hierarchy marks it safe
    assert(!f.isInstanceOf[graft.etl.AtomicPut])
    // overwrite=false is silently ignored: both writers land, last wins
    val p = new Path(s"$root/claim.txt")
    val o1 = f.create(p, false); o1.write(bytes("first")); o1.close()
    val o2 = f.create(p, false); o2.write(bytes("second")); o2.close()
    val in = f.open(p)
    assert((try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()) === "second")
    // ...but the store advertises the Hadoop 3.4.x conditional-create option
    assert(ConditionalCreate.supports(f, p))
    // and HONORS it through the createFile builder: the publish-at-
    // close PUT of a second writer fails with the 412 marker
    val c = new Path(s"$root/cond.txt")
    def conditionalWrite(payload: String): Unit = {
      val b = f.createFile(c).overwrite(false)
      b.must(ConditionalCreate.OverwriteOption, true)
      val out = b.build()
      try out.write(bytes(payload)) finally out.close()
    }
    conditionalWrite("winner")
    val e = intercept[java.io.IOException](conditionalWrite("loser"))
    assert(ConditionalCreate.isLostRace(e), s"expected a 412-family failure, got: $e")
    val in2 = f.open(c)
    assert((try scala.io.Source.fromInputStream(in2, "UTF-8").mkString finally in2.close()) === "winner")
    // polarity pin (HADOOP-19256): the boolean is an ENABLE flag —
    // must(option, false) does NOT engage the guard; both writers
    // land, last wins (a shim that inverted the reading would throw)
    val u = new Path(s"$root/uncond.txt")
    def uncondWrite(payload: String): Unit = {
      val b = f.createFile(u).overwrite(false)
      b.must(ConditionalCreate.OverwriteOption, false)
      val out = b.build()
      try out.write(bytes(payload)) finally out.close()
    }
    uncondWrite("first"); uncondWrite("last")
    val in3 = f.open(u)
    assert((try scala.io.Source.fromInputStream(in3, "UTF-8").mkString finally in3.close()) === "last")
  }

  test("isLostRace: a genuine failure whose message embeds '412' or 'already exists' in a PATH propagates") {
    // commit files are zero-padded versions — .../000412.json — and
    // store messages embed the path; only ANCHORED markers may read as
    // a lost race (ADVICE r10: unanchored contains() double-commits)
    val notRaces = Seq(
      new java.io.IOException("connection reset writing s3a://bkt/_log/000412.json"),
      new java.io.IOException("credential expired for /tables/x/already existsish/v1.json"))
    notRaces.foreach(e => assert(!ConditionalCreate.isLostRace(e), e.getMessage))
    val races = Seq(
      new java.io.IOException("PUT failed: Status Code: 412; precondition"),
      new java.io.IOException("412 Precondition Failed (If-None-Match: *)"),
      new org.apache.hadoop.fs.FileAlreadyExistsException("s3a://bkt/_log/000007.json"))
    races.foreach(e => assert(ConditionalCreate.isLostRace(e), e.getMessage))
  }

  test("the adapter maps conditional create onto the AtomicPut contract") {
    val root = tmpUri("graft_ccadapter")
    val f = hfs(root)
    val ap = new ConditionalCreateAtomicPut(f)
    val p = new Path(s"$root/ptr.json")
    val before = claimCount()
    assert(ap.putIfAbsent(p, bytes("one")))
    assert(!ap.putIfAbsent(p, bytes("two"))) // lost race reads as clean false
    assert(claimCount() >= before + 1)
    val in = f.open(p)
    assert((try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()) === "one")
  }

  test("an object store with neither AtomicPut nor conditional create still fails fast") {
    // same store semantics, capability masked: the adapter must NOT
    // engage and CommitLog must refuse rather than check-then-create
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.oss.impl", classOf[graft.testfs.BareObjectStoreFileSystem].getName)
    val d = java.nio.file.Files.createTempDirectory("graft_bare").toFile
    d.deleteOnExit()
    val t = "oss://" + d.getAbsolutePath + "/t"
    import spark.implicits._
    // staging the parquet succeeds (plain data writes need no claim);
    // the COMMIT claim is what refuses, driver-side and typed
    val ex = intercept[IllegalStateException] {
      CommitLog.write(spark, Seq((1L, "a")).toDF("id", "v"), t, overwrite = false)
    }
    assert(ex.getMessage.contains("refusing an unsafe check-then-create"))
    // and the refusal cleaned the staged batch: directory invariant
    val f = hfs(t)
    val dataDir = new Path(s"$t/_data")
    assert(!f.exists(dataDir) || f.listStatus(dataDir).isEmpty)
  }
}
