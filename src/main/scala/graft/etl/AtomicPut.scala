package graft.etl

/** Capability marker for [[org.apache.hadoop.fs.FileSystem]]s that can
  * publish a small object at a contended name ATOMICALLY and only if
  * the name is absent — the one primitive an optimistic commit
  * protocol needs on stores whose `create(path, overwrite = false)` is
  * not exclusive and whose `rename` is copy+delete.
  *
  * Real-world implementations map to public conditional-write APIs:
  * S3 `PutObject` with `If-None-Match: *` (generally available since
  * late 2024), GCS `x-goog-if-generation-match: 0`, Azure Blob
  * `If-None-Match: *`. The contract has two halves and both matter:
  *
  *  1. '''if-absent''': exactly one of any number of concurrent calls
  *     for the same path returns true; the rest return false without
  *     disturbing the winner's bytes.
  *  2. '''atomic visibility''': a reader either sees the complete
  *     object or no object — never a prefix. (Object PUTs give this
  *     for free; file systems need write-temp-then-atomic-move.)
  *
  * [[CommitLog]] probes for this trait and refuses to run on a known
  * object-store scheme without it — a classic object store with
  * neither conditional writes nor an external coordinator cannot host
  * a safe multi-writer log, and failing fast beats corrupting one.
  */
trait AtomicPut {
  /** Publish `bytes` at `path` iff absent. True = this call won. */
  def putIfAbsent(path: org.apache.hadoop.fs.Path, bytes: Array[Byte]): Boolean
}
