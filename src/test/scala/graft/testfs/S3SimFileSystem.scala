package graft.testfs

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataOutputStream, FileUtil, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Object-store semantics simulator, registered as `s3sim://` in the
  * spec suite (`fs.s3sim.impl`): a local-disk FileSystem that
  * deliberately exhibits the classic S3 failure modes the commit
  * protocol must survive —
  *
  *  - '''rename is copy-then-delete''', non-atomic, and silently
  *    overwrites the destination (what every S3 "rename" really is);
  *  - '''create(path, overwrite = false) is NOT exclusive''' — the
  *    flag is ignored and the last writer wins, exactly like an
  *    unconditional S3 PUT, so naive check-then-create commit guards
  *    are void here;
  *  - the ONLY atomicity on offer is [[graft.etl.AtomicPut]], modeling
  *    S3 conditional writes (`PutObject` + `If-None-Match: *`): a
  *    JVM-wide mutex arbitrates absence, and the object becomes
  *    visible via an atomic move so readers see all bytes or none.
  *
  * Anything that works against this FileSystem (CommitLogSpec's
  * object-store suite) relies on no rename atomicity and no create
  * exclusivity — the S3-semantics proof the protocol doc claims.
  */
class S3SimFileSystem extends RawLocalFileSystem with graft.etl.AtomicPut {
  override def getScheme: String = "s3sim"
  // NB: called from the RawLocalFileSystem super-constructor, before any
  // subclass field initializes — must not read instance state
  override def getUri: URI = S3SimFileSystem.SchemeUri

  override def initialize(name: URI, conf: Configuration): Unit =
    super.initialize(name, conf)

  // classic object store: "rename" downloads+uploads every byte, is in
  // no way atomic, and clobbers whatever was at the destination
  override def rename(src: Path, dst: Path): Boolean = {
    if (!exists(src)) false
    else {
      if (exists(dst)) delete(dst, true)
      val ok = FileUtil.copy(this, src, this, dst, false, getConf)
      if (ok) delete(src, true)
      ok
    }
  }

  // unconditional PUT: the overwrite=false exclusivity everyone leans on
  // for HDFS commit guards simply does not exist — last writer wins
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    super.create(f, permission, true, bufferSize, replication, blockSize, progress)

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    super.create(f, true, bufferSize, replication, blockSize, progress)

  /** S3 conditional write: if-absent guard + atomic full-object
    * visibility. Counted so specs can assert the protocol actually
    * used the conditional path.
    */
  override def putIfAbsent(path: Path, bytes: Array[Byte]): Boolean =
    S3SimFileSystem.mutex.synchronized {
      if (exists(path)) false
      else {
        mkdirs(path.getParent)
        val tmp = new Path(path.getParent, s".inflight-${java.util.UUID.randomUUID().toString.take(8)}")
        val out = create(tmp, true)
        try out.write(bytes) finally out.close()
        java.nio.file.Files.move(pathToFile(tmp).toPath, pathToFile(path).toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        S3SimFileSystem.conditionalPuts.incrementAndGet()
        true
      }
    }
}

object S3SimFileSystem {
  private[testfs] val SchemeUri = URI.create("s3sim:///")
  private[testfs] val mutex = new Object
  val conditionalPuts = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Register the shim on the shared session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.s3sim.impl", classOf[S3SimFileSystem].getName)
  }
}
