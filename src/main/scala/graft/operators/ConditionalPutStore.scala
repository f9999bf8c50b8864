package graft.operators

import org.apache.hadoop.fs.{FileAlreadyExistsException, FileSystem, Path}

/** CONTRIB-style [[CommitStore]] implementations for object stores
  * whose `create(path, overwrite = false)` is NOT atomic (plain S3A's
  * HEAD-then-PUT — the lost-commit CommitStoreSpec demonstrates).
  * Two public deployment shapes, both reduced to ONE abstract method
  * a deployment implements against its store's real primitive; the
  * spec drives both through fake primitives (this sandbox has no
  * object store to test against — the double pins the PROTOCOL:
  * exactly one racer wins, the loser signals with the contract's
  * exact exception type, nothing is ever silently replaced).
  *
  * 1. [[ConditionalPutStore]] — the store's OWN conditional write:
  *    S3 `PutObject` with `If-None-Match: *` (a public S3 feature),
  *    GCS `x-goog-if-generation-match: 0`, Azure Blob
  *    `If-None-Match: *`. One round trip, no external dependency.
  *    Implement [[ConditionalPutStore.putIfAbsent]]:
  *    {{{
  *    // AWS SDK v2 sketch (compile against your deployment's SDK):
  *    // s3.putObject(PutObjectRequest.builder()
  *    //     .bucket(b).key(k).ifNoneMatch("*").build(),
  *    //   RequestBody.fromBytes(bytes))
  *    // catch S3Exception if statusCode == 412 => false  // lost
  *    }}}
  * 2. [[ExternalArbiterStore]] — the public Delta DynamoDB-LogStore
  *    shape for stores WITHOUT a conditional write: an external CAS
  *    table arbitrates each path claim, and only the claim WINNER
  *    performs the (plain, even non-atomic) file write — the racy
  *    window disappears because at most one writer ever PUTs a given
  *    path. Implement [[ExternalArbiterStore.claim]]:
  *    {{{
  *    // DynamoDB sketch: PutItem {tablePath, manifestName} with
  *    // ConditionExpression "attribute_not_exists(manifestName)"
  *    // => true; ConditionalCheckFailedException => false.
  *    }}}
  *    The arbiter entry is write-once and never deleted while the
  *    manifest exists (a vacuumed manifest's entry may be pruned by
  *    the same sweep). Crash AFTER claim but BEFORE the file lands
  *    orphans the version number — exactly an aborted-transaction
  *    tombstone, which [[Snapshots]]' claim arbitration already
  *    steps over.
  *
  * Both signal the loser with
  * [[org.apache.hadoop.fs.FileAlreadyExistsException]] — the ONE type
  * [[Snapshots.retryingWrite]] retries and the txn arbitration keys
  * on (the r11-tightened contract).
  */
abstract class ConditionalPutStore extends CommitStore {

  /** Atomically create the object iff absent: true = won, false =
    * something already holds the path (the CONDITION failed). Throw
    * only for REAL failures (network, auth) — those must propagate,
    * not masquerade as a lost race. */
  def putIfAbsent(fs: FileSystem, path: Path, bytes: Array[Byte]): Boolean

  final override def createExclusive(fs: FileSystem, path: Path,
                                     bytes: Array[Byte]): Unit =
    if (!putIfAbsent(fs, path, bytes))
      throw new FileAlreadyExistsException(path.toString)
}

/** The external-arbiter shape (see [[ConditionalPutStore]] docs):
  * claim first, write only as the winner. The underlying write may be
  * a blind PUT — the arbiter guarantees at most one writer per path. */
abstract class ExternalArbiterStore extends CommitStore {

  /** CAS-claim `path` in the external arbiter: true = this writer
    * owns the path (and is the ONLY one that ever will), false = the
    * claim already exists. Real failures throw and propagate. */
  def claim(path: Path): Boolean

  final override def createExclusive(fs: FileSystem, path: Path,
                                     bytes: Array[Byte]): Unit = {
    if (!claim(path))
      throw new FileAlreadyExistsException(path.toString)
    // the winner's write: overwrite=true is SAFE here — no other
    // writer can hold the claim, so there is nothing to replace
    // except this writer's own partial retry
    val out = fs.create(path, true)
    try out.write(bytes) finally out.close()
  }
}
