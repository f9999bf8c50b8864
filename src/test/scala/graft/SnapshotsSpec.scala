package graft

import org.apache.spark.sql.functions._

import graft.operators.Snapshots

/** Manifest-committed snapshots: time travel, atomic version claims,
  * compaction that never breaks a reader, vacuum as the only delete. */
class SnapshotsSpec extends SparkSuite {

  import spark.implicits._

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_snap_$name")
    d.toFile.deleteOnExit()
    d.toString + "/tbl"
  }

  private def fixture = spark.range(0, 900, 1, 4)
    .select(
      pmod(col("id") * 811L + 13L, lit(900L)).as("key"),
      (col("id") * 31L).as("payload"))
    .withColumn("bucket", expr("key div 300"))

  private def keysAt(dir: String, v: Long): Seq[Long] =
    Snapshots.readAt(spark, dir, v).select("key").as[Long].collect().sorted.toSeq

  test("publish/append build versions; TIME TRAVEL: every version keeps " +
    "reading exactly its own rows after later commits") {
    val dir = tmpDir("tt")
    assert(Snapshots.versions(spark, dir).isEmpty)
    assert(Snapshots.publish(fixture.filter(col("key") % 3 === 0), dir,
      "bucket", Seq("key")) === 1L)
    assert(Snapshots.append(fixture.filter(col("key") % 3 === 1), dir,
      "bucket", Seq("key")) === 2L)
    assert(Snapshots.append(fixture.filter(col("key") % 3 === 2), dir,
      "bucket", Seq("key")) === 3L)
    assert(Snapshots.versions(spark, dir) === Seq(1L, 2L, 3L))
    assert(keysAt(dir, 1) === (0L until 900L by 3).toSeq)
    assert(keysAt(dir, 2) === (0L until 900L).filter(_ % 3 <= 1))
    assert(keysAt(dir, 3) === (0L until 900L).toSeq)
    // bucket column recovered through the manifest read
    assert(Snapshots.read(spark, dir).filter(col("bucket") === 2L).count() === 300L)
    // each load contributed one file per touched bucket
    assert(Snapshots.files(spark, dir, 1).size === 3)
    assert(Snapshots.files(spark, dir, 2).size === 6)
    assert(Snapshots.files(spark, dir, 3).size === 9)
  }

  test("commit is an ATOMIC version claim: a taken version throws and " +
    "changes nothing; a crash before commit leaves orphans invisible") {
    val dir = tmpDir("atomic")
    Snapshots.publish(fixture, dir, "bucket", Seq("key"))
    val before = Snapshots.files(spark, dir, 1)
    intercept[java.io.IOException](
      Snapshots.commit(spark, dir, 1L, Seq("data/zz/bogus.parquet")))
    assert(Snapshots.files(spark, dir, 1) === before, "loser changed nothing")
    // simulate a crashed writer: staged data, no manifest
    val orphanDir = new java.io.File(s"$dir/data/orphan1/bucket=0")
    orphanDir.mkdirs()
    fixture.limit(5).drop("bucket").coalesce(1)
      .write.mode("overwrite").parquet(orphanDir.toString)
    assert(Snapshots.read(spark, dir).count() === 900L,
      "uncommitted staging is invisible to readers")
    val (_, deleted, kept) = Snapshots.vacuum(spark, dir, 1L)
    assert(deleted >= 1L, "vacuum sweeps the orphaned staging files")
    assert(kept === 3L)
    assert(Snapshots.read(spark, dir).count() === 900L)
  }

  test("compact merges ONLY fragmented buckets into a new version, " +
    "SHARES untouched files with the previous version, and the previous " +
    "version still reads its exact rows afterwards") {
    val dir = tmpDir("cmp")
    Snapshots.publish(fixture, dir, "bucket", Seq("key"))
    // fragment bucket 0 only
    Snapshots.append(fixture.filter(col("key") < 10), dir, "bucket", Seq("key"))
    val v3 = Snapshots.compact(spark, dir, "bucket", Seq("key"))
    assert(v3 === 3L)
    val f2 = Snapshots.files(spark, dir, 2).toSet
    val f3 = Snapshots.files(spark, dir, 3).toSet
    def bucketOf(rel: String) = rel.split("/").find(_.startsWith("bucket=")).get
    // untouched buckets: identical file paths in both versions
    assert(f2.filter(bucketOf(_) != "bucket=0") ===
      f3.filter(bucketOf(_) != "bucket=0"))
    // fragmented bucket: 2 files became 1 NEW file
    assert(f2.count(bucketOf(_) == "bucket=0") === 2)
    assert(f3.count(bucketOf(_) == "bucket=0") === 1)
    assert((f3 -- f2).size === 1)
    // old version unbroken; new version = same multiset of rows
    assert(Snapshots.readAt(spark, dir, 2).count() === 910L)
    assert(Snapshots.readAt(spark, dir, 3).count() === 910L)
    assert(keysAt(dir, 3) === keysAt(dir, 2))
    // merged file is key-sorted
    val merged = (f3 -- f2).head
    val ks = spark.read.parquet(s"$dir/$merged").select("key").as[Long].collect()
    assert(ks.toSeq === ks.sorted.toSeq)
    // compacting an already-compact table is a no-op (same version back)
    assert(Snapshots.compact(spark, dir, "bucket", Seq("key")) === 3L)
  }

  test("vacuum drops old versions and deletes exactly the files no kept " +
    "version references; shared files survive") {
    val dir = tmpDir("vac")
    Snapshots.publish(fixture, dir, "bucket", Seq("key"))
    Snapshots.append(fixture.filter(col("key") < 10), dir, "bucket", Seq("key"))
    Snapshots.compact(spark, dir, "bucket", Seq("key"))
    // files ever: v1=3, append adds 1 (bucket 0), compact adds 1 merged = 5
    // kept by v3: buckets 1,2 from v1 (shared) + merged bucket 0 = 3
    intercept[IllegalArgumentException](Snapshots.vacuum(spark, dir, 99L))
    val (dropped, deleted, kept) = Snapshots.vacuum(spark, dir, 3L)
    assert(dropped === 2L && deleted === 2L && kept === 3L)
    assert(Snapshots.versions(spark, dir) === Seq(3L))
    assert(Snapshots.read(spark, dir).count() === 910L)
    intercept[IllegalArgumentException](Snapshots.readAt(spark, dir, 1L)
      .count())
  }
}
