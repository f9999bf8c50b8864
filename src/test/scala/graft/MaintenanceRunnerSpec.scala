package graft

import org.apache.spark.sql.functions._

import graft.operators.{MaintenanceRunner => MR, Snapshots, ZOrderTable}

/** The maintenance SCHEDULER shapes: the cron-style multi-table sweep
  * (layout dispatch, per-table policy, failures reported not thrown)
  * and the StreamingQueryListener hook that lets a streaming sink
  * table self-maintain. */
class MaintenanceRunnerSpec extends SparkSuite {

  import spark.implicits._

  private def tmpRoot(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_mrun_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def rows(lo: Long, hi: Long) =
    spark.range(lo, hi, 1, 4).select(col("id").as("k"),
      (col("id") % 8).as("bucket"), (col("id") * 3).as("v"))

  test("runAll sweeps a warehouse root: each layout dispatches to its OWN " +
    "maintenance, ONLY the retainversions-bearing table vacuums, a table " +
    "with neither layout metadata nor maintain props is skipped with a " +
    "report, and a non-table directory is ignored") {
    val root = tmpRoot("sweep")
    // flat table WITH retention + maintain props: 3 fragmented loads
    val tRetain = s"$root/a_retain"
    Snapshots.publish(rows(0, 400), tRetain, "bucket", Seq("k"),
      meta = Seq("prop:retainversions=1", "prop:maintain.bucket=bucket",
        "prop:maintain.sort=k"))
    Snapshots.append(rows(400, 500), tRetain, "bucket", Seq("k"))
    Snapshots.append(rows(500, 600), tRetain, "bucket", Seq("k"))
    // flat table with maintain props but NO retention: compacts only
    val tKeep = s"$root/b_keep"
    Snapshots.publish(rows(0, 300), tKeep, "bucket", Seq("k"),
      meta = Seq("prop:maintain.bucket=bucket", "prop:maintain.sort=k"))
    Snapshots.append(rows(300, 400), tKeep, "bucket", Seq("k"))
    // a table that declares NOTHING: skipped, never guessed
    val tBare = s"$root/c_bare"
    Snapshots.publish(rows(0, 100), tBare, "bucket", Seq("k"))
    // a z-table with retention: dispatches to the z migrator
    val tZ = s"$root/d_z"
    ZOrderTable.publish(
      spark.range(0, 5000, 1, 4).select(col("id"),
        (col("id") * 7919 % 65536).as("x"), (col("id") * 104729 % 65536).as("y")),
      tZ, Seq("x", "y"), 26, meta = Seq("prop:retainversions=1"))
    ZOrderTable.evolveShift(spark, tZ, 28)
    // a non-table directory under the root: ignored by the sweep
    new java.io.File(s"$root/z_not_a_table").mkdirs()
    val reports = MR.runAll(spark, root, retainMs = 0)
    assert(reports.map(_.dir.split("/").last) ===
      Seq("a_retain", "b_keep", "c_bare", "d_z"), s"got $reports")
    val byName = reports.map(r => r.dir.split("/").last -> r).toMap
    // retention table: compacted AND vacuumed to 1 version
    assert(byName("a_retain").layout === "flat")
    assert(byName("a_retain").result.get.compactedTo.isDefined)
    assert(Snapshots.versions(spark, tRetain).size === 1)
    assert(Snapshots.read(spark, tRetain).count() === 600)
    // no-retention table: compacted, NOTHING deleted
    assert(byName("b_keep").layout === "flat")
    assert(byName("b_keep").result.get.vacuumedFrom.isEmpty)
    assert(Snapshots.versions(spark, tKeep).size === 3,
      "both loads + the compact survive — no retention prop, no deletion")
    // bare table: skipped with the stated reason, untouched
    assert(byName("c_bare").layout === "skipped" &&
      byName("c_bare").note.get.contains("never guesses"))
    assert(Snapshots.versions(spark, tBare) === Seq(1L))
    // z-table: the z dispatch ran its migrator (stale epoch rewritten)
    assert(byName("d_z").layout === "z")
    assert(byName("d_z").result.get.compactedTo.isDefined)
    assert(ZOrderTable.fileShifts(spark, tZ,
      Snapshots.latest(spark, tZ).get).values.toSet === Set(28))
    assert(Snapshots.versions(spark, tZ).size === 1, "z retention vacuumed")
    // a sick table (maintain props naming a missing column, fragments
    // forcing the compactor to actually run) reports, never throws
    val tSick = s"$root/e_sick"
    Snapshots.publish(rows(0, 50), tSick, "bucket", Seq("k"),
      meta = Seq("prop:maintain.bucket=bucket", "prop:maintain.sort=nope"))
    Snapshots.append(rows(50, 100), tSick, "bucket", Seq("k"))
    val r2 = MR.maintainOne(spark, tSick, retainMs = 0)
    assert(r2.layout === "error" && r2.note.isDefined, s"$r2")
  }

  test("MaintenanceListener: a streaming sink table SELF-maintains every " +
    "N microbatches — retention prop honored, maintenance off the batch " +
    "path (listener bus)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpRoot("listener") + "/sink"
    val listener = new MR.MaintenanceListener(spark, Seq(dir),
      everyNBatches = 2L, retainMs = 0)
    spark.streams.addListener(listener)
    try {
      val ms = MemoryStream[Long]
      val q = ms.toDF.toDF("k")
        .select(col("k"), (col("k") % 4).as("bucket"), (col("k") * 2).as("v"))
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          Snapshots.mergeBatch(id, b, dir, "bucket", Seq("k"), Seq("k"))
          if (id == 0) {
            Snapshots.setProp(spark, dir, "retainversions", Some("1"))
            Snapshots.setProp(spark, dir, "maintain.bucket", Some("bucket"))
            Snapshots.setProp(spark, dir, "maintain.sort", Some("k"))
          }
          ()
        }.start()
      // listener events are ASYNC: after every 2nd batch, wait for its
      // maintenance pass to land before feeding the next batch (the
      // spec serializes what production interleaves — a racing pass
      // would just report ConcurrentModification and retry next time)
      def awaitReports(n: Int): Unit = {
        val deadline = System.currentTimeMillis() + 30000
        while (listener.reports.size < n &&
          System.currentTimeMillis() < deadline) Thread.sleep(100)
        assert(listener.reports.size >= n,
          s"listener pass $n never ran: ${listener.reports}")
      }
      try {
        (0 until 4).foreach { i =>
          ms.addData((i * 100L) until (i * 100L + 50L))
          q.processAllAvailable()
          if ((i + 1) % 2 == 0) awaitReports((i + 1) / 2)
        }
      } finally q.stop()
      assert(listener.reports.nonEmpty, "the listener ran maintenance")
      assert(listener.reports.forall(r =>
        r.layout == "flat" && r.result.isDefined), s"${listener.reports}")
      // the last pass retention-vacuumed to the newest version
      assert(Snapshots.versions(spark, dir).size === 1,
        s"retention vacuumed old versions: ${Snapshots.versions(spark, dir)}")
      // the ledger survives maintenance (the carried #batch header)
      assert(Snapshots.lastAppliedBatch(spark, dir) === Some(3L))
      assert(Snapshots.read(spark, dir).count() === 200)
    } finally {
      spark.streams.removeListener(listener)
      listener.close()
    }
  }
}
