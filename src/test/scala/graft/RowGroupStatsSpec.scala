package graft

import org.apache.spark.sql.functions._

import graft.operators.Snapshots

/** Format 2.3 per-ROW-GROUP manifest statistics (`#stat3`): recorded
  * at staging for multi-row-group files only, consumed by the box
  * scan to read surviving BYTE RANGES instead of whole files — the
  * decision entirely manifest-side (no footer opens at planning),
  * the answers identical to the full filter. */
class RowGroupStatsSpec extends SparkSuite {

  import spark.implicits._

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_rg_$name")
    d.toFile.deleteOnExit()
    d.toString + "/tbl"
  }

  private def fixture = spark.range(0, 20000, 1, 1).select(
    col("id").as("key"), (col("id") * 31L).as("payload"),
    lit(0L).as("bucket"))

  test("a MID-FILE range that file-level stats cannot prune reads ONLY " +
    "the surviving row groups: #stat3 recorded at staging (multi-group " +
    "files only), the range decision is manifest-only, consecutive " +
    "survivors merge into one byte range, and the scan equals the full " +
    "filter bit-for-bit") {
    val dir = tmpDir("mid")
    // the range-read EXECUTION is conf-gated (the decision is not) —
    // this case pins the execution path end to end
    spark.conf.set(Snapshots.RgScanKey, "true")
    // ONE bucket -> ONE file; tiny blocks -> many row groups over the
    // sorted key; 'key' declared as a stats column so stat2+stat3 record
    Snapshots.publish(fixture, dir, "bucket", Seq("key"),
      blockSize = 64L * 1024, numTasks = 1, statsCols = Seq("key"))
    val mf = new java.io.File(f"$dir/_manifests/v${1L}%020d")
    val lines = scala.io.Source.fromFile(mf, "UTF-8").getLines().toList
    val rgLines = lines.filter(_.startsWith("#stat3:key:"))
    assert(rgLines.size >= 4,
      s"64KB blocks over 20k sorted rows must yield several row groups " +
        s"(got ${rgLines.size})")
    // file-level stats CANNOT prune an interior range (the one file
    // covers [0, 20000)) — the row-group refinement can
    val (whole, partial) =
      Snapshots.prunedRangesBox(spark, dir, 1L, Seq(("key", 5000L, 6000L)))
    assert(whole.isEmpty && partial.size === 1,
      s"the single file must go PARTIAL, got whole=$whole partial=$partial")
    val ranges = partial.head._2
    val fileBytes = new java.io.File(s"$dir/${partial.head._1}").length()
    val rangeBytes = ranges.map(_._2).sum
    assert(rangeBytes < fileBytes / 2,
      s"a 5% key range over sorted data must skip most bytes " +
        s"($rangeBytes of $fileBytes survive)")
    assert(ranges.size === 1,
      s"consecutive surviving row groups merge into ONE range: $ranges")
    // identical answers
    val pruned = Snapshots.prunedScanAtBox(spark, dir, 1L,
      Seq(("key", 5000L, 6000L)))
    val full = Snapshots.read(spark, dir)
      .filter(col("key") >= 5000L && col("key") < 6000L)
    assert(pruned.collect().map(_.toSeq).toSet ===
      full.collect().map(_.toSeq).toSet)
    assert(pruned.count() === 1000L)
    // a range past every row group drops the file entirely — finer
    // than file-level... which would drop it too; the interesting
    // finer case: a range covering only the LAST row group
    val lastLo = 19990L
    val (w2, p2) =
      Snapshots.prunedRangesBox(spark, dir, 1L, Seq(("key", lastLo, 99999L)))
    assert(w2.isEmpty && p2.size === 1 && p2.head._2.size === 1)
    assert(Snapshots.prunedScanAtBox(spark, dir, 1L,
      Seq(("key", lastLo, 99999L))).count() === 20000L - lastLo)
    // default (conf off): same answers through the vectorized
    // whole-file read — Spark's own task-side pruning covers the skip
    spark.conf.unset(Snapshots.RgScanKey)
    assert(Snapshots.prunedScanAtBox(spark, dir, 1L,
      Seq(("key", 5000L, 6000L))).count() === 1000L)
  }

  test("degrades conservatively: single-row-group files record NO #stat3 " +
    "lines and read whole; a DV-bearing file reads whole (positions are " +
    "whole-file row indices) with the deletes applied; a RENAMED column " +
    "still prunes (stats are physical-keyed) and the range read maps " +
    "names") {
    val dir = tmpDir("degrade")
    // big blocks -> one row group per file -> no stat3 lines at all
    Snapshots.publish(fixture, dir, "bucket", Seq("key"),
      numTasks = 1, statsCols = Seq("key"))
    val mf1 = new java.io.File(f"$dir/_manifests/v${1L}%020d")
    assert(!scala.io.Source.fromFile(mf1, "UTF-8").getLines()
      .exists(_.startsWith("#stat3:")),
      "single-row-group files must not bloat the manifest with #stat3")
    assert(Snapshots.prunedScanAtBox(spark, dir, 1L,
      Seq(("key", 5000L, 6000L))).count() === 1000L)

    spark.conf.set(Snapshots.RgScanKey, "true")
    val dir2 = tmpDir("dv")
    Snapshots.publish(fixture, dir2, "bucket", Seq("key"),
      blockSize = 64L * 1024, numTasks = 1, statsCols = Seq("key"))
    // kill some keys INSIDE the probed range — the DV file must read
    // whole (conservative) and the scan must still subtract them
    val v2 = Snapshots.deleteVectored(
      fixture.filter(col("key") % 100 === 7).select("key", "bucket"),
      dir2, "bucket", Seq("key"))
    val (w3, p3) =
      Snapshots.prunedRangesBox(spark, dir2, v2, Seq(("key", 5000L, 6000L)))
    assert(p3.isEmpty && w3.size === 1,
      "a DV-bearing file degrades to the whole-file read")
    assert(Snapshots.prunedScanAtBox(spark, dir2, v2,
      Seq(("key", 5000L, 6000L))).count() === 1000L - 10L)

    // rename: the logical name prunes through the physical-keyed stats
    val dir3 = tmpDir("ren")
    Snapshots.publish(fixture, dir3, "bucket", Seq("key"),
      blockSize = 64L * 1024, numTasks = 1, statsCols = Seq("key"))
    val v3 = Snapshots.rename(spark, dir3, "key", "k2")
    val (w4, p4) =
      Snapshots.prunedRangesBox(spark, dir3, v3, Seq(("k2", 5000L, 6000L)))
    assert(w4.isEmpty && p4.size === 1,
      "the renamed column's stat3 lines resolve via the colmap")
    val scan = Snapshots.prunedScanAtBox(spark, dir3, v3,
      Seq(("k2", 5000L, 6000L)))
    assert(scan.columns.contains("k2") && scan.count() === 1000L)
    assert(scan.agg(sum("payload")).head().getLong(0) ===
      (5000L until 6000L).map(_ * 31L).sum)
    spark.conf.unset(Snapshots.RgScanKey)
  }

  test("#stat3 lines CARRY like their #stat2 siblings: a merge keeps the " +
    "untouched files' row-group lines and the rewritten files get fresh " +
    "ones; setProps/rename carry them verbatim") {
    val dir = tmpDir("carry")
    val df = spark.range(0, 20000, 1, 1).select(
      col("id").as("key"), (col("id") * 31L).as("payload"),
      (col("id") % 2).as("bucket"))
    Snapshots.publish(df, dir, "bucket", Seq("key"),
      blockSize = 64L * 1024, numTasks = 1, statsCols = Seq("key"))
    def rgLines(v: Long): Seq[String] = {
      val mf = new java.io.File(f"$dir/_manifests/v$v%020d")
      scala.io.Source.fromFile(mf, "UTF-8").getLines().toList
        .filter(_.startsWith("#stat3:"))
    }
    val before = rgLines(1L)
    assert(before.nonEmpty)
    // merge rewrites bucket 0 only: bucket 1's lines carry VERBATIM
    val v2 = Snapshots.merge(
      Seq((4L, -1L, 0L)).toDF("key", "payload", "bucket"),
      dir, "bucket", Seq("key"), Seq("key"), blockSize = 64L * 1024)
    val after = rgLines(v2)
    val keptB1 = before.filter(_.contains("__bdir=1"))
    assert(keptB1.nonEmpty && keptB1.forall(after.contains),
      "the untouched bucket's row-group lines carry")
    assert(after.exists(l => !before.contains(l)),
      "the rewritten bucket records fresh row-group lines")
    // metadata-only commits carry everything
    val v3 = Snapshots.setProp(spark, dir, "p", Some("1"))
    assert(rgLines(v3).toSet === after.toSet)
    val v4 = Snapshots.rename(spark, dir, "payload", "pay2")
    assert(rgLines(v4).toSet === after.toSet)
  }

  test("a block with UNUSABLE stats suppresses the whole (file, column) " +
    "#stat3 claim — all-or-nothing: the consumer treats recorded blocks " +
    "as the file's COMPLETE set (all-blocks-fail DROPS the file), so a " +
    "partial recording could silently lose the statless block's rows") {
    val dir = tmpDir("nanblock")
    // ONE sorted file, several 64KB row groups; dval carries a NaN at
    // key 15000 — parquet-mr's double min/max fold poisons that
    // block's stats (blockStat then refuses the NaN claim) while
    // every other block stays clean
    val df = spark.range(0, 20000, 1, 1).select(
      col("id").as("key"),
      when(col("id") === 15000L, lit(Double.NaN))
        .otherwise(col("id").cast("double")).as("dval"),
      lit(0L).as("bucket"))
    Snapshots.publish(df, dir, "bucket", Seq("key"),
      blockSize = 64L * 1024, numTasks = 1,
      statsCols = Seq("key", "dval"))
    val mf = new java.io.File(f"$dir/_manifests/v${1L}%020d")
    val lines = scala.io.Source.fromFile(mf, "UTF-8").getLines().toList
    assert(lines.count(_.startsWith("#stat3:key:")) >= 4,
      "the clean column still records its row-group detail")
    assert(!lines.exists(_.startsWith("#stat3:dval:")),
      "ONE unusable block kills the whole column's #stat3 claim " +
        "(per column — key's lines above prove the guard's granularity)")
    assert(!lines.exists(_.startsWith("#stat2:dval:")),
      "the file-level fold refuses the same way (shared walk)")
    // the regression: a predicate matching ONLY rows in the poisoned
    // block — with partial #stat3 recorded, every RECORDED block fails
    // and the file would DROP, silently losing these rows
    for (exec <- Seq(true, false)) {
      spark.conf.set(Snapshots.RgScanKey, exec.toString)
      try assert(Snapshots.prunedScanAtBox(spark, dir, 1L,
          Seq(("dval", 15001.0, 15010.0))).count() === 9L,
        s"rows beside the NaN must survive the box scan (exec=$exec)")
      finally spark.conf.unset(Snapshots.RgScanKey)
    }
  }
}
