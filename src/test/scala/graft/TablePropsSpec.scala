package graft

import org.apache.spark.sql.functions._

import graft.operators.Snapshots

/** Carried table properties (`#prop`) and the periodic checkpoint
  * policy (`ckptevery`): set once, ride every write path, drive the
  * committedness checkpoint without explicit maintenance calls. */
class TablePropsSpec extends SparkSuite {

  import spark.implicits._

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_props_$name")
    d.toFile.deleteOnExit()
    d.toString + "/tbl"
  }

  private def rows(lo: Long, hi: Long) =
    spark.range(lo, hi, 1, 4).select(col("id").as("k"),
      (col("id") % 8).as("bucket"), (col("id") * 3).as("v"))

  private def ckptFile(dir: String) =
    new java.io.File(s"$dir/_manifests/_checkpoint")

  test("props carry verbatim through append, merge, delete, compact and " +
    "rename; setProp adds, replaces and removes with metadata-only commits") {
    val dir = tmpDir("carry")
    Snapshots.publish(rows(0, 1000), dir, "bucket", Seq("k"),
      meta = Seq("prop:owner=pipeline-a"))
    def props = Snapshots.propsAt(spark, dir,
      Snapshots.latest(spark, dir).get)
    assert(props === Map("owner" -> "pipeline-a"))
    Snapshots.append(rows(1000, 1200), dir, "bucket", Seq("k"))
    assert(props === Map("owner" -> "pipeline-a"), "append carries")
    Snapshots.merge(rows(5, 6).withColumn("v", lit(99L)), dir, "bucket",
      Seq("k"), Seq("k"))
    assert(props === Map("owner" -> "pipeline-a"), "merge carries")
    Snapshots.delete(rows(5, 6).select("k", "bucket"), dir, "bucket",
      Seq("k"), Seq("k"))
    assert(props === Map("owner" -> "pipeline-a"), "delete carries")
    Snapshots.compact(spark, dir, "bucket", Seq("k"))
    assert(props === Map("owner" -> "pipeline-a"), "compact carries")
    Snapshots.rename(spark, dir, "v", "val")
    assert(props === Map("owner" -> "pipeline-a"), "rename carries")
    // setProp: add a second, replace the first, then remove
    val vFiles = Snapshots.files(spark, dir, Snapshots.latest(spark, dir).get)
    Snapshots.setProp(spark, dir, "tier", Some("gold"))
    assert(props === Map("owner" -> "pipeline-a", "tier" -> "gold"))
    Snapshots.setProp(spark, dir, "owner", Some("pipeline-b"))
    assert(props === Map("owner" -> "pipeline-b", "tier" -> "gold"))
    Snapshots.setProp(spark, dir, "tier", None)
    assert(props === Map("owner" -> "pipeline-b"))
    // metadata-only: the file list never changed, and the table still reads
    assert(Snapshots.files(spark, dir,
      Snapshots.latest(spark, dir).get) === vFiles)
    assert(Snapshots.read(spark, dir).count() === 1199)
    assert(Snapshots.read(spark, dir).columns.contains("val"),
      "setProp preserved the rename")
    intercept[IllegalArgumentException] {
      Snapshots.setProp(spark, dir, "bad=key", Some("x"))
    }
  }

  test("ckptevery policy: every Nth commit refreshes the committedness " +
    "checkpoint as part of the write itself; a fresh process seeds from it") {
    val dir = tmpDir("policy")
    Snapshots.publish(rows(0, 500), dir, "bucket", Seq("k"),
      meta = Seq("prop:ckptevery=2"))
    assert(!ckptFile(dir).exists(), "v1: below the policy period")
    Snapshots.append(rows(500, 600), dir, "bucket", Seq("k"))
    assert(ckptFile(dir).exists(), "v2: policy fired inside the commit")
    val afterV2 = ckptFile(dir).lastModified()
    val lenV2 = ckptFile(dir).length()
    Snapshots.append(rows(600, 700), dir, "bucket", Seq("k"))
    assert(ckptFile(dir).length() === lenV2, "v3: off-period, not refreshed")
    Snapshots.append(rows(700, 800), dir, "bucket", Seq("k"))
    assert(ckptFile(dir).length() > lenV2,
      s"v4: refreshed (covers 4 versions, was $afterV2)")
    // the checkpoint a fresh process would read covers all 4 versions
    Snapshots.clearCaches()
    assert(Snapshots.versions(spark, dir) === Seq(1L, 2L, 3L, 4L))
    assert(Snapshots.read(spark, dir).count() === 800)
    // policy is itself a prop: removable like any other
    Snapshots.setProp(spark, dir, "ckptevery", None)
    assert(Snapshots.propsAt(spark, dir,
      Snapshots.latest(spark, dir).get).isEmpty)
    // a malformed policy value must never fail the durable write —
    // the hook ignores it (the commit already happened when it runs)
    Snapshots.setProp(spark, dir, "ckptevery", Some("not-a-number"))
    val v = Snapshots.append(rows(800, 900), dir, "bucket", Seq("k"))
    assert(Snapshots.read(spark, dir).count() === 900)
    assert(Snapshots.versions(spark, dir).contains(v))
  }

  test("maintain: props-driven one-call maintenance — compacts fragments, " +
    "retention-vacuums to the newest N versions, refreshes the checkpoint; " +
    "a kept version still referencing old files protects them") {
    val dir = tmpDir("maint")
    Snapshots.publish(rows(0, 400), dir, "bucket", Seq("k"),
      meta = Seq("prop:retainversions=2"))
    Snapshots.append(rows(400, 500), dir, "bucket", Seq("k"))
    Snapshots.append(rows(500, 600), dir, "bucket", Seq("k"))
    assert(Snapshots.files(spark, dir, 3L).size === 24, "8 buckets x 3 loads")
    val r = Snapshots.maintain(spark, dir, "bucket", Seq("k"), retainMs = 0)
    assert(r.compactedTo === Some(4L))
    // retain 2 of [1,2,3,4] -> keepFrom 3; v3 still references every
    // original fragment, so NOTHING is deleted (reference safety)
    assert(r.vacuumedFrom === Some(3L))
    assert(r.manifestsDropped === 2L && r.filesDeleted === 0L)
    assert(r.checkpointCovers === 2L)
    assert(Snapshots.versions(spark, dir) === Seq(3L, 4L))
    assert(Snapshots.read(spark, dir).count() === 600)
    // a second pass has nothing to do (no fragments, retention holds)
    val r2 = Snapshots.maintain(spark, dir, "bucket", Seq("k"), retainMs = 0)
    assert(r2.compactedTo.isEmpty && r2.vacuumedFrom.isEmpty &&
      r2.manifestsDropped === 0L && r2.filesDeleted === 0L)
    // tighten retention to 1 (a metadata commit, v5): the next pass
    // drops v3+v4 and the fragments finally become unreferenced
    Snapshots.setProp(spark, dir, "retainversions", Some("1"))
    val r3 = Snapshots.maintain(spark, dir, "bucket", Seq("k"), retainMs = 0)
    assert(r3.vacuumedFrom === Some(5L))
    assert(r3.manifestsDropped === 2L && r3.filesDeleted === 24L)
    assert(Snapshots.versions(spark, dir) === Seq(5L))
    assert(Snapshots.read(spark, dir).count() === 600)
    assert(r3.checkpointCovers === 1L)
    // no retention prop -> never deletes (compact+checkpoint only)
    val bare = tmpDir("maint_bare")
    Snapshots.publish(rows(0, 100), bare, "bucket", Seq("k"))
    Snapshots.append(rows(100, 200), bare, "bucket", Seq("k"))
    val rb = Snapshots.maintain(spark, bare, "bucket", Seq("k"), retainMs = 0)
    assert(rb.compactedTo === Some(3L) && rb.vacuumedFrom.isEmpty &&
      rb.filesDeleted === 0L)
    assert(Snapshots.versions(spark, bare) === Seq(1L, 2L, 3L))
  }

  test("the exactly-once batch ledger SURVIVES maintenance: compact and " +
    "metadata-only commits carry the newest #batch header, so a retention " +
    "vacuum cannot erase it and a restart's re-delivered batch is still " +
    "absorbed; a foreign batch-less commit on top is clamped around") {
    val dir = tmpDir("ledger")
    def sink(lo: Long, hi: Long, id: Long): Unit = {
      Snapshots.mergeBatch(id, rows(lo, hi), dir, "bucket", Seq("k"), Seq("k"))
      ()
    }
    sink(0, 200, 0L) // bootstrap, batch:0
    sink(0, 50, 1L) // batch:1
    // metadata-only commit (v3) — the #batch header must ride along
    Snapshots.setProp(spark, dir, "retainversions", Some("1"))
    val r = Snapshots.maintain(spark, dir, "bucket", Seq("k"), retainMs = 0)
    assert(Snapshots.versions(spark, dir).size === 1,
      s"retention kept exactly the newest version: $r")
    assert(Snapshots.lastAppliedBatch(spark, dir) === Some(1L),
      "the ledger's high-water mark survived the vacuum")
    // a restart re-delivers batch 1 with DIFFERENT (stale replay) rows:
    // absorbed — no new version, no data change
    val head = Snapshots.latest(spark, dir).get
    val before = Snapshots.read(spark, dir).agg(sum("v")).as[Long].head()
    Snapshots.mergeBatch(1L, rows(0, 50).withColumn("v", lit(-1L)),
      dir, "bucket", Seq("k"), Seq("k"))
    assert(Snapshots.latest(spark, dir).get === head, "replay absorbed")
    assert(Snapshots.read(spark, dir).agg(sum("v")).as[Long].head() === before)
    // FOREIGN writer: a batch-less commit that does NOT carry (simulated
    // by re-committing the head's manifest minus its #batch line) — the
    // maintain clamp refuses to vacuum past the batch-bearing version
    val mf = new java.io.File(f"$dir/_manifests/v$head%020d")
    val lines = scala.io.Source.fromFile(mf, "UTF-8").getLines().toList
    val (meta, files) = lines.filter(_.nonEmpty).partition(_.startsWith("#"))
    Snapshots.commit(spark, dir, head + 1, files,
      meta.filterNot(_.startsWith("#batch:")).map(_.stripPrefix("#")))
    val r2 = Snapshots.maintain(spark, dir, "bucket", Seq("k"), retainMs = 0)
    assert(Snapshots.versions(spark, dir).contains(head),
      s"clamp kept the newest batch-bearing version: $r2")
    assert(Snapshots.lastAppliedBatch(spark, dir) === Some(1L))
  }
}
