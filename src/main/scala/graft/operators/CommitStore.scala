package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** The ATOMIC-CLAIM primitive behind every manifest commit and
  * transaction record, made pluggable — the Delta-LogStore seam.
  *
  * [[Snapshots]]' whole correctness story reduces to one filesystem
  * contract: `createExclusive(path, bytes)` must atomically create
  * the file iff it does not exist, so that of two racing writers
  * exactly one wins and the loser THROWS. That contract holds for
  * `FileSystem.create(path, overwrite = false)` on HDFS, local
  * filesystems, ABFS and GCS — but NOT on plain S3A, whose
  * create(false) is a HEAD-then-PUT: two racers can both pass the
  * HEAD and the second PUT silently replaces the first manifest
  * (the lost-commit the CommitStoreSpec demonstrates). Deployments
  * on such stores plug a conditional-put implementation here
  * (S3 If-None-Match conditional writes, or an external
  * arbiter à la Delta's DynamoDB LogStore) via [[Snapshots.commitStore]];
  * everything above the seam — version claims, txn records,
  * force-abort arbitration — is store-agnostic.
  */
trait CommitStore {
  /** Atomically create `path` holding exactly `bytes` iff it does not
    * already exist. MUST throw
    * [[org.apache.hadoop.fs.FileAlreadyExistsException]] — that exact
    * type, not just any IOException — when the path exists (the
    * racing loser's signal: [[Snapshots.retryingWrite]] retries ONLY
    * this type plus the claim conflict, and the txn arbitration's
    * "lost the record race" detection keys on it too, so a
    * conditional-put implementation signalling its loser with a plain
    * IOException would PROPAGATE as a real failure instead of
    * re-planning). Wrap your store's exists-signal:
    * `throw new FileAlreadyExistsException(path.toString)`. MUST NOT
    * leave a partial or replaced file behind in either outcome; any
    * OTHER IOException is a real failure and propagates. */
  def createExclusive(fs: FileSystem, path: Path, bytes: Array[Byte]): Unit
}

/** The default: the filesystem's own create-exclusive. Correct
  * wherever `create(path, overwrite=false)` is one atomic primitive
  * (HDFS, local, ABFS, GCS). */
object AtomicCreateStore extends CommitStore {
  override def createExclusive(fs: FileSystem, path: Path,
                               bytes: Array[Byte]): Unit = {
    val out = fs.create(path, false) // throws FileAlreadyExists (an IOException)
    try out.write(bytes) finally out.close()
  }
}
