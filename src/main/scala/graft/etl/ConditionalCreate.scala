package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path}

/** [[AtomicPut]] adapter for REAL object-store schemes via Hadoop
  * 3.4.x '''conditional create''' (HADOOP-19256) — the public builder
  * option every store maps to its own conditional-write API:
  *
  * {{{
  * fs.createFile(path).overwrite(false)
  *   .must("fs.option.create.conditional.overwrite", true)
  *   .build()          // guard is enforced when the object publishes
  * }}}
  *
  * '''Option polarity''' (HADOOP-19256): the boolean is an ENABLE
  * flag, read with default `false` — `true` engages the conditional
  * write (the `If-None-Match: *` guard on the publishing PUT);
  * `false`/absent leaves the store's default create path. S3A's
  * `CreateFileBuilder` reads it as
  * `options.getBoolean(FS_OPTION_CREATE_CONDITIONAL_OVERWRITE, false)`
  * — passing `false` on a real bucket would perform a plain
  * (HEAD-check-then-)unguarded PUT and silently void the commit log's
  * mutual exclusion. The `ccsim://` test shim mirrors the same
  * enable-flag read so the contract suite exercises the true polarity.
  *
  * On S3A (hadoop-aws ≥ 3.4.1, `fs.s3a.create.conditional.enabled`,
  * on by default) the final `close()` PUT carries `If-None-Match: *`;
  * a losing writer's PUT fails with HTTP 412 which S3A surfaces as a
  * `RemoteFileChangedException` (a [[org.apache.hadoop.fs
  * .PathIOException]]). Because the whole object lands in ONE guarded
  * PUT, both halves of the [[AtomicPut]] contract hold: exactly one
  * concurrent writer wins the name, and readers see all bytes or none.
  *
  * ==Scheme → commit-claim guarantee==
  *
  * | scheme | claim primitive | engaged by |
  * |---|---|---|
  * | `hdfs`, `file`, `viewfs` | `create(p, overwrite=false)` is genuinely exclusive | CommitLog default branch |
  * | `s3a` + Hadoop ≥ 3.4.1 conditional create | PUT + `If-None-Match: *` (this adapter) | path-capability probe |
  * | `gs`, `abfs` connectors exposing conditional create | generation-0 / `If-None-Match` precondition (this adapter) | path-capability probe |
  * | any store whose FileSystem implements [[AtomicPut]] directly | the store's own conditional write | CommitLog first branch |
  * | object-store scheme with NONE of the above | — | '''fail fast''' (unsafe check-then-create is refused) |
  *
  * The adapter is only engaged when the FileSystem ADVERTISES the
  * option through `hasPathCapability` — a store that silently ignored
  * an unsupported `must()` option would void the guard, and Hadoop's
  * builder contract is that unsupported MANDATORY keys make `build()`
  * throw. The capability probe keeps even that failure off the commit
  * path for stores that never claimed support.
  */
object ConditionalCreate {

  /** `Options.CreateFileOptionKeys.FS_OPTION_CREATE_CONDITIONAL_OVERWRITE`
    * (referenced by value so the string also documents the wire
    * contract; the constant exists in hadoop-client-api 3.4.x).
    */
  val OverwriteOption: String =
    org.apache.hadoop.fs.Options.CreateFileOptionKeys.FS_OPTION_CREATE_CONDITIONAL_OVERWRITE

  /** Does `fs` advertise conditional create at `path`? (S3A answers
    * per-bucket config; errors read as "no" — the caller then takes
    * the fail-fast branch, never an unsafe one.)
    */
  def supports(fs: FileSystem, path: Path): Boolean =
    try fs.hasPathCapability(path, OverwriteOption)
    catch { case _: Throwable => false }

  /** A publish-time failure that MEANS "the name was already taken":
    * the HTTP 412 / precondition-failed family, S3A's
    * RemoteFileChangedException, or a plain already-exists. Anything
    * else (network reset mid-close, credential expiry) is NOT a lost
    * race — the object's state is unknown and the error must
    * propagate, not read as a clean `false`.
    */
  private[graft] def isLostRace(e: java.io.IOException): Boolean = {
    val msg = Option(e.getMessage).getOrElse("").toLowerCase
    e.isInstanceOf[org.apache.hadoop.fs.FileAlreadyExistsException] ||
      e.getClass.getSimpleName == "RemoteFileChangedException" ||
      statusCode(e).contains(412) ||
      // anchored patterns only: commit files are zero-padded version
      // numbers (…/000412.json), and S3/Hadoop messages embed the
      // path, so a bare contains("412")/"already exists" would misread
      // a genuine failure (state unknown!) as a clean lost race and
      // let the writer double-commit at N+1
      msg.contains("status code: 412") || msg.contains("precondition failed") ||
      msg.contains("if-none-match")
  }

  /** Structured HTTP status off an S3A/AWS-shaped exception, via
    * reflection so graft needs no hadoop-aws compile dep: AWS SDK v2
    * style `statusCode()` (AwsServiceException) and hadoop-aws
    * `getStatusCode()` (AWSServiceIOException) both probed, on the
    * exception and its cause.
    */
  private def statusCode(e: Throwable): Option[Int] = {
    def probe(t: Throwable): Option[Int] =
      Seq("statusCode", "getStatusCode").iterator.flatMap { m =>
        try Option(t.getClass.getMethod(m).invoke(t)).collect {
          case i: java.lang.Integer => i.intValue
        } catch { case _: Throwable => None }
      }.find(_ => true)
    probe(e).orElse(Option(e.getCause).flatMap(probe))
  }
}

/** The adapter instance [[CommitLog]] wraps around a capability-
  * advertising FileSystem. One guarded create per claim; `false` only
  * for a PROVEN lost race (see [[ConditionalCreate.isLostRace]]).
  */
final class ConditionalCreateAtomicPut(fs: FileSystem) extends AtomicPut {
  override def putIfAbsent(path: Path, bytes: Array[Byte]): Boolean = {
    try {
      val builder = fs.createFile(path).overwrite(false)
      // true = ENGAGE the If-None-Match guard (enable flag, default
      // false — see the polarity note in the companion scaladoc)
      builder.must(ConditionalCreate.OverwriteOption, true)
      val out = builder.build()
      // the conditional PUT happens when the object publishes (S3A:
      // at close) — keep close INSIDE the try so a 412 there reads as
      // a lost race, not an error
      try out.write(bytes) finally out.close()
      true
    } catch {
      case e: java.io.IOException if ConditionalCreate.isLostRace(e) => false
    }
  }
}
