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
}
