package graft

import org.apache.spark.sql.functions._

import graft.operators.{JoinPlanner, Ndv, Snapshots}

/** The manifest-driven join chooser: byte sizes / row counts recorded
  * and carried, the three strategy regimes decided from manifests
  * alone, executed results strategy-independent, and the KMV
  * join-cardinality estimate inside its band. */
class JoinPlannerSpec extends SparkSuite {

  import spark.implicits._

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_jp_$name")
    d.toFile.deleteOnExit()
    d.toString + "/tbl"
  }

  private def publishKeyed(dir: String, lo: Long, hi: Long,
                           keyOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Long =
    Snapshots.publish(
      spark.range(lo, hi, 1, 4).select(keyOf(col("id")).as("k"),
        col("id").as("payload"), (col("id") % 8).as("bucket")),
      dir, "bucket", Seq("k"), statsCols = Seq("k"), ndvCols = Seq("k"))

  test("fsize lines: sizeAt equals the real on-disk byte sum and carries " +
    "through merge and compact; rowCountAt equals the true count") {
    val dir = tmpDir("size")
    val v1 = publishKeyed(dir, 0, 5000, identity)
    def realBytes(v: Long): Long = Snapshots.files(spark, dir, v).map { rel =>
      new java.io.File(s"$dir/$rel").length()
    }.sum
    assert(Snapshots.sizeAt(spark, dir, v1) === realBytes(v1))
    assert(Snapshots.rowCountAt(spark, dir, v1) === Some(5000L))
    val v2 = Snapshots.merge(
      Seq((3L, 999L, 3L)).toDF("k", "payload", "bucket"),
      dir, "bucket", Seq("k"), Seq("k"))
    assert(Snapshots.sizeAt(spark, dir, v2) === realBytes(v2),
      "merge carried kept sizes and recorded new ones")
    assert(Snapshots.rowCountAt(spark, dir, v2) === Some(5000L))
    Snapshots.append(
      spark.range(5000, 5100, 1, 2).select(col("id").as("k"),
        col("id").as("payload"), (col("id") % 8).as("bucket")),
      dir, "bucket", Seq("k"))
    val v4 = Snapshots.compact(spark, dir, "bucket", Seq("k"))
    assert(Snapshots.sizeAt(spark, dir, v4) === realBytes(v4),
      "compact carried kept sizes and recorded rewritten ones")
    assert(Snapshots.rowCountAt(spark, dir, v4) === Some(5100L))
  }

  test("the three regimes decide from manifests alone: small side -> " +
    "broadcast; big uniform -> shuffle; big hot-multiplicity -> salted; " +
    "every executed result equals the plain join") {
    val big = tmpDir("big")
    val dim = tmpDir("dim")
    val skew = tmpDir("skew")
    publishKeyed(big, 0, 50000, c => c % 10000) // mult 5: uniform
    publishKeyed(dim, 0, 500, identity) // tiny
    publishKeyed(skew, 0, 50000, c => c % 500) // mult 100: hot
    // 1) small side fits the threshold: broadcast, build = smaller
    val d1 = JoinPlanner.plan(spark, big, dim, "k")
    assert(d1.strategy === "broadcast" && d1.buildSide === "right")
    // numbers that drove it are recorded and true
    assert(d1.left.rows === Some(50000L) && d1.right.rows === Some(500L))
    assert(d1.right.bytes < d1.left.bytes)
    // 2) threshold 0: no broadcast; uniform multiplicity -> shuffle
    val d2 = JoinPlanner.plan(spark, big, big, "k", broadcastBytes = 0)
    assert(d2.strategy === "shuffle")
    assert(math.abs(d2.left.mult.get - 5.0) < 1.5)
    // 3) threshold 0, hot side: salted, build = the hot side
    val d3 = JoinPlanner.plan(spark, skew, dim, "k", broadcastBytes = 0)
    assert(d3.strategy === "salted" && d3.buildSide === "left" &&
      d3.saltFactor === 16)
    // executed results are strategy-independent
    def plain(l: String, r: String) = {
      val lf = Snapshots.read(spark, l).drop("bucket")
      val rf = Snapshots.read(spark, r).drop("bucket")
        .withColumnRenamed("payload", "p2")
      lf.join(rf, "k")
    }
    def viaPlanner(l: String, r: String, d: JoinPlanner.Decision) = {
      val lf = Snapshots.readAt(spark, l, d.left.version).drop("bucket")
      val rf = Snapshots.readAt(spark, r, d.right.version).drop("bucket")
        .withColumnRenamed("payload", "p2")
      JoinPlanner.execute(lf, rf, "k", d)
    }
    for ((l, r, d) <- Seq((big, dim, d1), (skew, dim, d3))) {
      val a = viaPlanner(l, r, d).select("k", "payload", "p2")
      val b = plain(l, r).select("k", "payload", "p2")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"${d.strategy} result != plain join")
    }
    // the broadcast decision actually broadcasts (plan-level check)
    val bcPlan = viaPlanner(big, dim, d1).queryExecution.executedPlan.toString
    assert(bcPlan.contains("BroadcastHashJoin"), bcPlan.take(400))
  }

  test("estimateJoinRows: KMV-intersection x multiplicities lands inside " +
    "the band on a known-overlap join; undeclared stats -> None") {
    val l = tmpDir("estL")
    val r = tmpDir("estR")
    // left: keys 0..999 x4 rows; right: keys 500..1499 x2 rows
    // overlap 500 keys -> exact join rows = 500 * 4 * 2 = 4000
    publishKeyed(l, 0, 4000, c => c % 1000)
    publishKeyed(r, 0, 2000, c => c % 1000 + 500)
    val est = JoinPlanner.estimateJoinRows(spark, l, r, "k").get
    assert(math.abs(est / 4000.0 - 1.0) < 0.35,
      s"estimate $est outside the band around 4000")
    // pre-sizing off the estimate: ceil-divide, clamped both ends
    assert(JoinPlanner.suggestTasks(0L) === 1)
    assert(JoinPlanner.suggestTasks(4000001L) === 2)
    assert(JoinPlanner.suggestTasks(Long.MaxValue / 2) === 2048)
    assert(JoinPlanner.suggestTasks(est.toLong, rowsPerTask = 1000L) ===
      ((est.toLong + 999) / 1000).toInt)
    // a table without declared ndv stats cannot estimate
    val bare = tmpDir("bare")
    Snapshots.publish(
      spark.range(0, 100, 1, 2).select(col("id").as("k"),
        (col("id") % 4).as("bucket")),
      bare, "bucket", Seq("k"))
    assert(JoinPlanner.estimateJoinRows(spark, l, bare, "k").isEmpty)
  }

  test("PARTIAL sketches never estimate: a file without a recorded #ndv " +
    "line degrades the side to ndv=None (-> shuffle, never inferred " +
    "skew) and estimateJoinRows to None — the planner opens zero data " +
    "files to compensate") {
    val dir = tmpDir("partial")
    val dim = tmpDir("pdim")
    publishKeyed(dir, 0, 50000, c => c % 500) // mult 100: hot when complete
    publishKeyed(dim, 0, 500, identity)
    assert(JoinPlanner.plan(spark, dir, dim, "k",
      broadcastBytes = 0).strategy === "salted", "complete sketches: salted")
    // simulate the partial-stats table (files written before ndvcols
    // was declared / a foreign writer): re-commit the same files minus
    // ONE file's #ndv line
    val v1 = Snapshots.latest(spark, dir).get
    val mf = new java.io.File(f"$dir/_manifests/v$v1%020d")
    val lines = scala.io.Source.fromFile(mf, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    val (meta, files) = lines.partition(_.startsWith("#"))
    val firstNdv = meta.find(_.startsWith("#ndv:")).get
    Snapshots.commit(spark, dir, v1 + 1, files,
      meta.filterNot(_ == firstNdv).map(_.stripPrefix("#")))
    // the now-partial side: no multiplicity claim -> SHUFFLE, and no
    // join-cardinality estimate — a wrong number is worse than none
    val d = JoinPlanner.plan(spark, dir, dim, "k", broadcastBytes = 0)
    assert(d.strategy === "shuffle" && d.left.ndv.isEmpty &&
      d.left.mult.isEmpty, s"partial sketches degraded cleanly: $d")
    assert(d.left.rows.isDefined, "row counts still read (they are complete)")
    assert(JoinPlanner.estimateJoinRows(spark, dir, dim, "k").isEmpty)
  }

  test("the salt DOSE scales with the measured multiplicity: the floor " +
    "holds moderate skew, a 5000-multiplicity key gets x128 (next pow2 " +
    "of mult/target), capped at 256") {
    // pure arithmetic first (floor, scaling, cap, pow2-ness)
    assert(JoinPlanner.saltDose(100.0, 64.0, 16) === 16, "floor")
    assert(JoinPlanner.saltDose(3000.0, 64.0, 16) === 64)
    assert(JoinPlanner.saltDose(5000.0, 64.0, 16) === 128)
    assert(JoinPlanner.saltDose(1e9, 64.0, 16) === 256, "cap")
    // and through the planner on real manifests
    val hot = tmpDir("hot5k")
    val dim = tmpDir("hdim")
    publishKeyed(hot, 0, 50000, c => c % 10) // mult 5000
    publishKeyed(dim, 0, 10, identity)
    val d = JoinPlanner.plan(spark, hot, dim, "k", broadcastBytes = 0)
    assert(d.strategy === "salted" && d.saltFactor === 128,
      s"measured mult ~5000 -> dose 128: $d")
    // the dosed execution still returns exactly the plain join
    val a = JoinPlanner.execute(
      Snapshots.readAt(spark, hot, d.left.version).drop("bucket"),
      Snapshots.readAt(spark, dim, d.right.version).drop("bucket")
        .withColumnRenamed("payload", "p2"), "k", d)
    val b = Snapshots.read(spark, hot).drop("bucket").join(
      Snapshots.read(spark, dim).drop("bucket")
        .withColumnRenamed("payload", "p2"), "k")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("broadcast thresholds compare INFLATED bytes (at-rest parquet is " +
    "not in-memory size): a side below the threshold at rest but above " +
    "it x4 chooses shuffle; byte-based task sizing prefers #fsize sums") {
    val big = tmpDir("ibig")
    val dim = tmpDir("idim")
    publishKeyed(big, 0, 50000, c => c % 10000)
    publishKeyed(dim, 0, 2000, identity)
    val dimBytes = Snapshots.sizeAt(spark, dim,
      Snapshots.latest(spark, dim).get)
    // threshold 2x the at-rest size: WITHOUT the inflation factor this
    // would broadcast a build side ~2x over budget in memory
    val d = JoinPlanner.plan(spark, big, dim, "k",
      broadcastBytes = dimBytes * 2)
    assert(d.strategy === "shuffle", s"inflated ${dimBytes}x4 > ${dimBytes * 2}: $d")
    // at 8x the at-rest size the inflated build fits: broadcast
    val d2 = JoinPlanner.plan(spark, big, dim, "k",
      broadcastBytes = dimBytes * 8)
    assert(d2.strategy === "broadcast" && d2.buildSide === "right")
    // byte-based sizing: arithmetic + the manifest-dispatch preference
    assert(JoinPlanner.suggestTasksBytes(0L) === 1)
    assert(JoinPlanner.suggestTasksBytes(256L * 1024 * 1024 + 1) === 2)
    assert(JoinPlanner.suggestTasksBytes(Long.MaxValue / 2) === 2048)
    assert(JoinPlanner.suggestTasksBytes(10L * 1024 * 1024 * 1024,
      bytesPerTask = 1024L * 1024 * 1024) === 10)
    // a table WITH #fsize lines sizes by bytes (small table -> 1 task);
    // rows would have said 1 here too, so pin the dispatch via a target
    // small enough that BYTES dominate (>1 task at 4KB/task)
    assert(JoinPlanner.suggestTasksFor(spark, dim,
      Snapshots.latest(spark, dim).get) === 1)
    assert(JoinPlanner.suggestTasksFor(spark, dim,
      Snapshots.latest(spark, dim).get, bytesPerTask = 4096) ===
      JoinPlanner.suggestTasksBytes(dimBytes, bytesPerTask = 4096))
  }
}
