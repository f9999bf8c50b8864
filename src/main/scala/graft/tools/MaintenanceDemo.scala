package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{MaintenanceRunner, Snapshots, ZOrderTable}

/** The ops-team deployment shape for table maintenance: build a tiny
  * warehouse (a retention-bearing flat table with fragments, a
  * retention-bearing z-table with a stale epoch, a bare table that
  * must be skipped), run ONE [[MaintenanceRunner.runAll]] sweep over
  * the root, and print the per-table reports — what a cron job's log
  * line looks like. Run: `sbt "runMain graft.tools.MaintenanceDemo"`. */
object MaintenanceDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = sys.props("java.io.tmpdir").stripSuffix("/") +
      "/graft_maintenance_demo"
    Snapshots.dropPath(spark, root)
    def rows(lo: Long, hi: Long) =
      spark.range(lo, hi, 1, 4).select(col("id").as("k"),
        (col("id") % 8).as("bucket"), (col("id") * 3).as("v"))
    // a flat table with retention + fragments (3 loads per bucket)
    val flat = s"$root/events"
    Snapshots.publish(rows(0, 400), flat, "bucket", Seq("k"),
      meta = Seq("prop:retainversions=1", "prop:maintain.bucket=bucket",
        "prop:maintain.sort=k"))
    Snapshots.append(rows(400, 500), flat, "bucket", Seq("k"))
    Snapshots.append(rows(500, 600), flat, "bucket", Seq("k"))
    // a z-table mid-shift-migration
    val ztab = s"$root/spatial"
    ZOrderTable.publish(
      spark.range(0, 5000, 1, 4).select(col("id"),
        (col("id") * 7919 % 65536).as("x"),
        (col("id") * 104729 % 65536).as("y")),
      ztab, Seq("x", "y"), 26, meta = Seq("prop:retainversions=1"))
    ZOrderTable.evolveShift(spark, ztab, 28)
    // a table that declares no layout and no maintain props: skipped
    Snapshots.publish(rows(0, 100), s"$root/mystery", "bucket", Seq("k"))
    val reports = MaintenanceRunner.runAll(spark, root, retainMs = 0)
    reports.foreach { r =>
      val outcome = r.result.map(m =>
        s"compacted=${m.compactedTo.nonEmpty} " +
          s"vacuumed=${m.manifestsDropped} manifests/${m.filesDeleted} files " +
          s"ckpt=${m.checkpointCovers}")
        .getOrElse(r.note.getOrElse("?"))
      println(s"[maintenance] ${r.dir.split("/").last} layout=${r.layout} $outcome")
    }
    require(reports.size == 3 && reports.count(_.result.isDefined) == 2,
      s"expected 2 maintained + 1 skipped, got $reports")
    println("[maintenance] OK")
    spark.stop()
  }
}
