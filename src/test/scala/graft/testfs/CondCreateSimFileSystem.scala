package graft.testfs

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataOutputStream, FSDataOutputStreamBuilder, FileUtil, Path, PathIOException, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Object-store simulator #2, registered as `ccsim://`: models the
  * PUBLIC surface of S3A with Hadoop ≥ 3.4.1 conditional create
  * (HADOOP-19256) — the half of the real-world story the `s3sim://`
  * shim deliberately does not cover:
  *
  *  - same classic S3 semantics as s3sim: '''rename is copy+delete'''
  *    and clobbers; '''create(p, overwrite = false) is NOT
  *    exclusive''' (the flag is ignored, last writer wins);
  *  - does '''NOT''' implement [[graft.etl.AtomicPut]] — nothing in
  *    graft's own type hierarchy marks it safe;
  *  - instead it advertises `fs.option.create.conditional.overwrite`
  *    through `hasPathCapability` and honors it through the
  *    `createFile` builder: when the option is set (must) to `true`
  *    (S3A's enable-flag polarity, default false — HADOOP-19256),
  *    the stream buffers and the object publishes at `close()` under
  *    an if-absent guard — an existing object makes close throw a
  *    [[PathIOException]] carrying the `412 Precondition Failed`
  *    marker, exactly how S3A surfaces a lost `If-None-Match: *` PUT
  *    (RemoteFileChangedException). Publication is an atomic move, so
  *    readers see all bytes or none — the object-PUT visibility
  *    contract.
  *
  * [[graft.etl.CommitLog]] must therefore reach this store ONLY
  * through the capability probe + [[graft.etl
  * .ConditionalCreateAtomicPut]] adapter — which is precisely what
  * CondCreateObjectStoreSpec proves, running the same protocol suite
  * as the s3sim one.
  */
class CondCreateSimFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "ccsim"
  override def getUri: URI = CondCreateSimFileSystem.SchemeUri

  override def initialize(name: URI, conf: Configuration): Unit =
    super.initialize(name, conf)

  // classic object store: copy+delete, non-atomic, clobbers destination
  override def rename(src: Path, dst: Path): Boolean = {
    if (!exists(src)) false
    else {
      if (exists(dst)) delete(dst, true)
      val ok = FileUtil.copy(this, src, this, dst, false, getConf)
      if (ok) delete(src, true)
      ok
    }
  }

  // unconditional PUT: overwrite=false is silently ignored, last wins
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    super.create(f, permission, true, bufferSize, replication, blockSize, progress)

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    super.create(f, true, bufferSize, replication, blockSize, progress)

  override def hasPathCapability(path: Path, capability: String): Boolean =
    capability == graft.etl.ConditionalCreate.OverwriteOption ||
      super.hasPathCapability(path, capability)

  /** The S3A-shaped builder: conditional-overwrite honored at close. */
  override def createFile(path: Path): FSDataOutputStreamBuilder[_, _] =
    new CondCreateSimFileSystem.Builder(this, path)

  /** Publish the buffered temp object at `target`. Conditional mode:
    * if-absent guard + atomic move under the store mutex; an occupied
    * name loses with the 412 marker S3A uses. Unconditional mode:
    * plain last-writer-wins move.
    */
  private[testfs] def publish(tmp: Path, target: Path, conditional: Boolean): Unit =
    CondCreateSimFileSystem.mutex.synchronized {
      if (conditional && exists(target)) {
        try delete(tmp, false) catch { case _: Throwable => () }
        throw new PathIOException(target.toString,
          "PUT failed: 412 Precondition Failed (If-None-Match: *): object already exists")
      }
      mkdirs(target.getParent)
      if (exists(target)) delete(target, true)
      java.nio.file.Files.move(pathToFile(tmp).toPath, pathToFile(target).toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      if (conditional) CondCreateSimFileSystem.conditionalCreates.incrementAndGet()
    }
}

/** Capability-less variant of the same store, registered under a real
  * object-store scheme (`oss://`) in the fail-fast spec: identical
  * non-exclusive-create / copy-rename semantics, NO AtomicPut, and the
  * conditional-create capability MASKED — the configuration
  * [[graft.etl.CommitLog]] must refuse outright rather than degrade to
  * check-then-create.
  */
class BareObjectStoreFileSystem extends CondCreateSimFileSystem {
  override def getScheme: String = "oss"
  override def getUri: URI = BareObjectStoreFileSystem.SchemeUri
  override def hasPathCapability(path: Path, capability: String): Boolean =
    capability != graft.etl.ConditionalCreate.OverwriteOption &&
      super.hasPathCapability(path, capability)
}

object BareObjectStoreFileSystem {
  private[testfs] val SchemeUri = URI.create("oss:///")
}

object CondCreateSimFileSystem {
  private[testfs] val SchemeUri = URI.create("ccsim:///")
  private[testfs] val mutex = new Object
  val conditionalCreates = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Register the shim on the shared session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.ccsim.impl", classOf[CondCreateSimFileSystem].getName)
  }

  /** Builder honoring `fs.option.create.conditional.overwrite`: the
    * object buffers to an uncontended in-flight name and publishes at
    * close() — create-in-close, the object-store reality the Hadoop
    * option models.
    */
  private final class Builder(fs: CondCreateSimFileSystem, path: Path)
    extends FSDataOutputStreamBuilder[FSDataOutputStream, Builder](fs, path) {
    override def getThisBuilder: Builder = this

    override def build(): FSDataOutputStream = {
      val key = graft.etl.ConditionalCreate.OverwriteOption
      // the option is only honored as a MUST key (Hadoop contract:
      // must() keys an FS does not understand fail the build; opt()
      // keys may be ignored). Polarity mirrors S3A's CreateFileBuilder
      // (HADOOP-19256): an ENABLE flag read with default false — TRUE
      // engages the If-None-Match guard on the publishing PUT.
      val conditional =
        getMandatoryKeys.contains(key) && getOptions.getBoolean(key, false)
      val tmp = new Path(path.getParent,
        s".inflight-${java.util.UUID.randomUUID().toString.take(8)}")
      fs.mkdirs(path.getParent)
      val raw = fs.create(tmp, true)
      val publishOnClose = new java.io.FilterOutputStream(raw) {
        // route array writes through in one call (FilterOutputStream
        // defaults to byte-at-a-time; irrelevant for tiny pointers but
        // no reason to model a slower store than the real one)
        override def write(b: Array[Byte], off: Int, len: Int): Unit =
          raw.write(b, off, len)
        private var closed = false
        override def close(): Unit = {
          if (!closed) {
            closed = true
            super.close()
            fs.publish(tmp, path, conditional)
          }
        }
      }
      new FSDataOutputStream(publishOnClose, null)
    }
  }
}
