package graft

import graft.testfs.S3SimFileSystem

/** S3-semantics proof #1 for the commit protocol (etl/CommitLog.scala,
  * etl/Wap.scala, etl/Bundle.scala): the full
  * [[ObjectStoreContractSuite]] against the registered `s3sim://`
  * FileSystem, whose rename is copy+delete+overwrite and whose
  * `create(p, overwrite=false)` is NOT exclusive — the only atomic
  * primitive is the [[graft.etl.AtomicPut]] conditional write the
  * store itself implements (testfs/S3SimFileSystem.scala). Green means
  * the protocol leans on neither rename atomicity nor create
  * exclusivity. The sibling [[CondCreateObjectStoreSpec]] proves the
  * same contract through the Hadoop conditional-create ADAPTER path.
  */
class ObjectStoreSpec extends ObjectStoreContractSuite {

  S3SimFileSystem.register(spark)

  override def schemeName: String = "s3sim"
  override def claimCount(): Int = S3SimFileSystem.conditionalPuts.get()

  test("the shim really has object-store semantics: no exclusive create, copy+delete rename") {
    val root = tmpUri("graft_s3sem")
    val f = hfs(root)
    assert(f.isInstanceOf[S3SimFileSystem])
    val p = new org.apache.hadoop.fs.Path(s"$root/claim.txt")
    // overwrite=false is silently ignored — BOTH writers succeed, last wins:
    // exactly the failure mode that voids naive check-then-create guards
    val o1 = f.create(p, false); o1.write("first".getBytes("UTF-8")); o1.close()
    val o2 = f.create(p, false); o2.write("second".getBytes("UTF-8")); o2.close()
    val in = f.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    assert(txt === "second")
    // rename clobbers an existing destination (S3 copy semantics)
    val q = new org.apache.hadoop.fs.Path(s"$root/dst.txt")
    val o3 = f.create(q, false); o3.write("old".getBytes("UTF-8")); o3.close()
    assert(f.rename(p, q))
    val in2 = f.open(q)
    assert((try scala.io.Source.fromInputStream(in2, "UTF-8").mkString finally in2.close()) === "second")
    assert(!f.exists(p))
    // ...while the conditional write IS exclusive
    val c = new org.apache.hadoop.fs.Path(s"$root/cond.txt")
    assert(f.asInstanceOf[S3SimFileSystem].putIfAbsent(c, "a".getBytes))
    assert(!f.asInstanceOf[S3SimFileSystem].putIfAbsent(c, "b".getBytes))
  }
}
