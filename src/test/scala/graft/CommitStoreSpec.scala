package graft

import org.apache.spark.sql.functions._

import graft.operators.{AtomicCreateStore, CommitStore, Snapshots}

/** The commit-store seam: the exact filesystem contract the manifest
  * claim rests on, the S3A-shaped failure DEMONSTRATED (HEAD-then-PUT
  * loses a racing commit silently), and Snapshots running end-to-end
  * over a conditional-put store where the loser loses CLEANLY. */
class CommitStoreSpec extends SparkSuite {

  import spark.implicits._

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_cstore_$name")
    d.toFile.deleteOnExit()
    d.toString + "/tbl"
  }

  private def fixture = spark.range(0, 300, 1, 2)
    .select(col("id").as("key"), (col("id") * 31L).as("payload"))
    .withColumn("bucket", expr("key div 100"))

  private def fsOf(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** What plain S3A create(overwrite=false) actually is: a HEAD
    * existence check, then a BLIND PUT. `interleave` runs between the
    * two — the window a real racer lands in. */
  private class HeadThenPutStore(interleave: () => Unit) extends CommitStore {
    override def createExclusive(fs: org.apache.hadoop.fs.FileSystem,
                                 path: org.apache.hadoop.fs.Path,
                                 bytes: Array[Byte]): Unit = {
      if (fs.exists(path)) // HEAD
        throw new java.io.IOException(s"$path already exists")
      interleave()
      val out = fs.create(path, true) // blind PUT — replaces silently
      try out.write(bytes) finally out.close()
    }
  }

  /** A correct store for stores WITHOUT atomic create: an arbiter
    * decides each path exactly once (S3 conditional PUT / Delta's
    * DynamoDB LogStore shape — here an in-process set, which is
    * exactly the arbiter's job). Fully contract-correct, so plugging
    * it process-wide is safe. */
  private object ConditionalPutStore extends CommitStore {
    private val claimed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val losses = new java.util.concurrent.atomic.AtomicLong(0)
    override def createExclusive(fs: org.apache.hadoop.fs.FileSystem,
                                 path: org.apache.hadoop.fs.Path,
                                 bytes: Array[Byte]): Unit = {
      if (!claimed.add(path.toString) || fs.exists(path)) {
        losses.incrementAndGet()
        // the CONTRACT's loser signal — the exact type, not a plain
        // IOException: retryingWrite and the txn arbitration key on it
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(
          s"conditional put lost: $path exists")
      }
      val out = fs.create(path, true)
      try out.write(bytes) finally out.close()
    }
  }

  test("the HAZARD, demonstrated: a HEAD-then-PUT store under a racer " +
    "that lands between the two loses the racer's commit SILENTLY — " +
    "both writers believe they won, one manifest is gone") {
    val dir = tmpDir("hazard")
    val p = new org.apache.hadoop.fs.Path(s"$dir/claim")
    val fs = fsOf(dir)
    fs.mkdirs(p.getParent)
    var racerSucceeded = false
    val racy = new HeadThenPutStore(() => {
      // the racer commits THROUGH THE CONTRACT while writer A sits
      // between its HEAD and its PUT
      AtomicCreateStore.createExclusive(fs, p, "RACER\n".getBytes("UTF-8"))
      racerSucceeded = true
    })
    racy.createExclusive(fs, p, "WRITER_A\n".getBytes("UTF-8")) // no throw!
    assert(racerSucceeded, "the racer's create-exclusive succeeded")
    val in = fs.open(p)
    val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    // BOTH writers returned success, but only one manifest exists —
    // the racer's committed state vanished: the lost commit
    assert(content === "WRITER_A\n", "the blind PUT replaced the racer's file")
  }

  test("a conditional-put store plugged through the seam makes the loser " +
    "lose CLEANLY: Snapshots runs end-to-end (publish/append/merge/txn " +
    "arbitration), a double-claim throws, and the winner's state is intact") {
    Snapshots.commitStore = ConditionalPutStore
    try {
      val dir = tmpDir("seam")
      Snapshots.publish(fixture, dir, "bucket", Seq("key"))
      Snapshots.append(fixture.filter(col("key") < 5)
        .withColumn("payload", lit(-1L)), dir, "bucket", Seq("key"))
      Snapshots.merge(fixture.filter(col("key") === 7L)
        .withColumn("payload", lit(77L)), dir, "bucket", Seq("key"), Seq("key"))
      assert(Snapshots.versions(spark, dir) === Seq(1L, 2L, 3L))
      val before = Snapshots.files(spark, dir, 3L)
      // a direct double-claim of a taken version: the loser THROWS
      // (java.io.IOException per the contract) and nothing changed
      val lossesBefore = ConditionalPutStore.losses.get()
      intercept[java.io.IOException](
        Snapshots.commit(spark, dir, 3L, Seq("data/zz/bogus.parquet")))
      assert(ConditionalPutStore.losses.get() === lossesBefore + 1)
      assert(Snapshots.files(spark, dir, 3L) === before, "winner intact")
      // txn arbitration still works through the seam: a plain writer
      // force-aborts an undecided txn by WINNING its record
      val txn = Snapshots.beginTxn(spark, dir + "_rec")
      txn.append(fixture.limit(10), dir, "bucket", Seq("key"))
      Snapshots.append(fixture.filter(col("key") === 9L)
        .withColumn("payload", lit(9L)), dir, "bucket", Seq("key"))
      intercept[IllegalStateException](txn.commit())
      assert(Snapshots.read(spark, dir).filter(col("payload") === 9L).count() === 1L)
    } finally Snapshots.commitStore = AtomicCreateStore
  }

  test("the loser-signal TYPE matters: a FileAlreadyExists loser retries " +
    "through retryingWrite and lands; a store failing with a plain " +
    "IOException propagates as a real failure, never spins") {
    // a store that loses the race exactly once, with the contract type
    class LoseOnceStore(signal: () => java.io.IOException) extends CommitStore {
      var remaining = 1
      override def createExclusive(fs: org.apache.hadoop.fs.FileSystem,
                                   path: org.apache.hadoop.fs.Path,
                                   bytes: Array[Byte]): Unit = {
        if (remaining > 0 && path.getName.startsWith("v")) {
          remaining -= 1
          throw signal()
        }
        AtomicCreateStore.createExclusive(fs, path, bytes)
      }
    }
    val dir = tmpDir("signal")
    Snapshots.publish(fixture, dir, "bucket", Seq("key"))
    // contract-correct loser: retryingWrite re-plans and the write lands
    Snapshots.commitStore = new LoseOnceStore(() =>
      new org.apache.hadoop.fs.FileAlreadyExistsException("lost race"))
    try {
      val v = Snapshots.retryingWrite() {
        Snapshots.append(fixture.limit(3), dir, "bucket", Seq("key"))
      }
      assert(v === 2L, "the retried append claimed the next version")
    } finally Snapshots.commitStore = AtomicCreateStore
    // plain IOException = a real store failure: propagates, no retry
    val failing = new LoseOnceStore(() =>
      new java.io.IOException("store down"))
    Snapshots.commitStore = failing
    try {
      intercept[java.io.IOException](Snapshots.retryingWrite() {
        Snapshots.append(fixture.limit(3), dir, "bucket", Seq("key"))
      })
      assert(failing.remaining === 0, "failed exactly once — never retried")
    } finally Snapshots.commitStore = AtomicCreateStore
  }

  test("the SHIPPED contrib stores hold the contract through their " +
    "doubles: ConditionalPutStore turns a conditional-write primitive's " +
    "false into the EXACT loser type (N racers, one winner), and " +
    "ExternalArbiterStore makes even a BLIND-PUT filesystem lose-commit-" +
    "free — the hazard interleave that silently replaced a manifest now " +
    "loses cleanly at the claim") {
    import graft.operators.{ConditionalPutStore => CondTemplate, ExternalArbiterStore}
    // 1. the conditional-write shape over a fake If-None-Match
    val cond = new CondTemplate {
      private val seen =
        java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      override def putIfAbsent(fs: org.apache.hadoop.fs.FileSystem,
          path: org.apache.hadoop.fs.Path, bytes: Array[Byte]): Boolean =
        if (!seen.add(path.toString)) false
        else {
          val out = fs.create(path, true)
          try out.write(bytes) finally out.close()
          true
        }
    }
    val dir = tmpDir("contrib")
    val fs = fsOf(dir)
    val p = new org.apache.hadoop.fs.Path(s"$dir/claim")
    fs.mkdirs(p.getParent)
    val wins = new java.util.concurrent.atomic.AtomicLong(0)
    val losses = new java.util.concurrent.atomic.AtomicLong(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      (1 to 8).map(i => pool.submit(new Runnable {
        override def run(): Unit =
          try { cond.createExclusive(fs, p, s"W$i\n".getBytes("UTF-8"))
            wins.incrementAndGet(); () }
          catch {
            case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
              losses.incrementAndGet(); ()
          }
      })).foreach(_.get())
    } finally pool.shutdown()
    assert(wins.get() === 1L && losses.get() === 7L,
      "exactly one racer wins; every loser gets the contract's type")
    // 2. the external-arbiter shape over a BLIND-PUT fs: replay the
    // hazard test's interleave — the racer that used to be silently
    // replaced now either wins the claim or loses CLEANLY
    val arbiter =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val arb = new ExternalArbiterStore {
      override def claim(path: org.apache.hadoop.fs.Path): Boolean =
        arbiter.add(path.toString)
    }
    val p2 = new org.apache.hadoop.fs.Path(s"$dir/claim2")
    // writer A "passes its HEAD" (claims) first — OUTSIDE the
    // intercept, so A's own claim throwing would fail the test
    // instead of satisfying it — then the racer MUST lose, and must
    // lose with the exact type
    arb.createExclusive(fs, p2, "A\n".getBytes("UTF-8"))
    intercept[org.apache.hadoop.fs.FileAlreadyExistsException] {
      arb.createExclusive(fs, p2, "RACER\n".getBytes("UTF-8"))
    }
    val in = fs.open(p2)
    val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    assert(content === "A\n", "the winner's manifest is intact — no " +
      "blind PUT ever ran without owning the claim")
    // 3. end-to-end through the seam: Snapshots runs on the arbiter
    // store (its file writes are blind PUTs — safe, claim-guarded)
    Snapshots.commitStore = arb
    try {
      val tdir = tmpDir("contrib_e2e")
      Snapshots.publish(fixture, tdir, "bucket", Seq("key"))
      Snapshots.append(fixture.limit(5), tdir, "bucket", Seq("key"))
      assert(Snapshots.versions(spark, tdir) === Seq(1L, 2L))
      assert(Snapshots.read(spark, tdir).count() === 305L)
    } finally Snapshots.commitStore = AtomicCreateStore
  }
}
