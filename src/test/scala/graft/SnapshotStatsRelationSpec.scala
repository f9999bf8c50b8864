package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.ManifestFileIndex

import graft.operators.Snapshots

/** The manifest-backed snapshot relation: table statistics reported to
  * Spark's OWN optimizer (a plain join broadcasts with no JoinPlanner
  * call), zero-filesystem-op planning, and data skipping on plain
  * `.filter`s from the manifest's recorded per-file stats. */
class SnapshotStatsRelationSpec extends SparkSuite {

  import spark.implicits._

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_srel_$name")
    d.toFile.deleteOnExit()
    d.toString + "/tbl"
  }

  private def scanOf(df: DataFrame): FileSourceScanExec = {
    df.collect() // materialize so the scan's metrics are filled
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no file scan in the plan"))
  }

  test("a snapshot read IS a manifest-statistics relation: sizeInBytes " +
    "comes from the recorded #fsize sum, and a plain fact.join(smallDim) " +
    "plans a BroadcastHashJoin under the DEFAULT session threshold with " +
    "NO JoinPlanner call") {
    val fact = tmpDir("fact")
    val dim = tmpDir("dim")
    Snapshots.publish(
      spark.range(0, 50000, 1, 4).select(col("id").as("k"),
        (col("id") * 31).as("payload"), (col("id") % 16).as("bucket")),
      fact, "bucket", Seq("k"))
    Snapshots.publish(
      spark.range(0, 200, 1, 2).select(col("id").as("k"),
        format_string("d%04d", col("id")).as("name"),
        (col("id") % 4).as("bucket")),
      dim, "bucket", Seq("k"))
    // the relation's FileIndex is the manifest one, and its size is the
    // manifest's recorded byte sum — no filesystem listing involved
    val factDf = Snapshots.read(spark, fact)
    val scan = scanOf(factDf)
    assert(scan.relation.location.isInstanceOf[ManifestFileIndex],
      s"snapshot reads go through the manifest FileIndex: ${scan.relation.location.getClass}")
    assert(scan.relation.location.sizeInBytes ===
      Snapshots.sizeAt(spark, fact, Snapshots.latest(spark, fact).get))
    // the headline: a user-written join with NO planner call broadcasts
    // because Spark itself can now see the dim side's true size
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      .stripSuffix("b") === "10485760", "session threshold at its default")
    val joined = factDf.join(Snapshots.read(spark, dim).drop("bucket"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"manifest stats -> broadcast: ${plan.take(500)}")
    assert(joined.count() === 200L)
  }

  test("planning-time DATA SKIPPING from pushed-down filters: a range " +
    "predicate on a stats column reads only the surviving files, a " +
    "string equality prunes by the base64 byte stats, results always " +
    "equal the full-scan filter, and non-stats predicates read everything") {
    val dir = tmpDir("skip")
    // 8 key-ranged buckets, one file each; s-prefixed string payload
    Snapshots.publish(
      spark.range(0, 8000, 1, 4).select(col("id").as("k"),
        format_string("s%05d", col("id")).as("s"),
        (col("id") * 7 % 100).as("noise"),
        expr("id div 1000").as("bucket")),
      dir, "bucket", Seq("k"), statsCols = Seq("s", "noise"))
    val total = Snapshots.files(spark, dir,
      Snapshots.latest(spark, dir).get).size
    assert(total === 8)
    // layout-key range via the #stat lines: 2 of 8 files
    val narrow = Snapshots.read(spark, dir)
      .filter(col("k") >= 2000L && col("k") < 4000L)
    val scan1 = scanOf(narrow)
    assert(scan1.metrics("numFiles").value === 2,
      s"key range pruned to 2 files, got ${scan1.metrics("numFiles").value}")
    assert(narrow.count() === 2000L, "pruning never changes answers")
    // string equality via the #stat2 base64 byte stats: 1 of 8 files
    val point = Snapshots.read(spark, dir).filter(col("s") === "s06500")
    val scan2 = scanOf(point)
    assert(scan2.metrics("numFiles").value === 1,
      s"string point pruned to 1 file, got ${scan2.metrics("numFiles").value}")
    assert(point.select("k").as[Long].head() === 6500L)
    // a predicate on a column with stats but full-range values: all files
    // survive (stats make no claim that can discriminate)
    val wide = Snapshots.read(spark, dir).filter(col("noise") === 3L)
    assert(scanOf(wide).metrics("numFiles").value === 8)
    assert(wide.count() ===
      spark.range(0, 8000).filter(col("id") * 7 % 100 === 3L).count())
    // IN lists prune to the union of the members' files
    val inq = Snapshots.read(spark, dir)
      .filter(col("k").isin(500L, 6500L, 6600L))
    assert(scanOf(inq).metrics("numFiles").value === 2,
      "IN over two buckets reads exactly those 2 files")
    assert(inq.count() === 3L)
    // startsWith prunes by the byte-range [prefix, succ(prefix))
    val pre = Snapshots.read(spark, dir).filter(col("s").startsWith("s06"))
    assert(scanOf(pre).metrics("numFiles").value === 1,
      "prefix s06 lives entirely in the 6000-bucket file")
    assert(pre.count() === 1000L)
    // unknown filter shapes make no claim: everything is read, the
    // residual is exact
    val odd = Snapshots.read(spark, dir).filter(col("k") % 2 === 1L)
    assert(scanOf(odd).metrics("numFiles").value === 8)
    assert(odd.count() === 4000L)
  }

  test("TIMESTAMP predicates data-skip: the typed stats record micros " +
    "and a pushed-down range on a timestamp column drops whole files; " +
    "a STRING-vs-timestamp comparison (cast on the attribute) makes no " +
    "claim and reads everything — conservative either way") {
    val dir = tmpDir("ts")
    Snapshots.publish(
      spark.range(0, 8000, 1, 4).select(col("id").as("k"),
        timestamp_micros(lit(800000000000000L) + col("id") * 1000000000L)
          .as("ts"),
        expr("id div 1000").as("bucket")),
      dir, "bucket", Seq("k"), statsCols = Seq("ts"))
    // [k=2000, k=4000) in micros: exactly 2 of 8 key-ranged files
    val lo = 800000000000000L + 2000L * 1000000000L
    val hi = 800000000000000L + 4000L * 1000000000L
    val narrow = Snapshots.read(spark, dir).filter(
      col("ts") >= lit(new java.sql.Timestamp(lo / 1000)) &&
        col("ts") < lit(new java.sql.Timestamp(hi / 1000)))
    assert(scanOf(narrow).metrics("numFiles").value === 2,
      "timestamp range pruned to 2 of 8 files")
    assert(narrow.count() === 2000L)
    // a string comparison casts the ATTRIBUTE: no claim, full read,
    // same answer
    val viaString = Snapshots.read(spark, dir)
      .filter(col("ts").cast("string") >= "2000")
    assert(scanOf(viaString).metrics("numFiles").value === 8)
  }

  test("skipping composes with RENAME (stats are physical-keyed, the " +
    "filter on the new name pushes through the projection) and with " +
    "time travel; merge-carried stats keep pruning") {
    val dir = tmpDir("ren")
    Snapshots.publish(
      spark.range(0, 8000, 1, 4).select(col("id").as("k"),
        (col("id") * 3).as("v"), expr("id div 1000").as("bucket")),
      dir, "bucket", Seq("k"))
    val v1 = Snapshots.latest(spark, dir).get
    Snapshots.rename(spark, dir, "k", "key")
    val df = Snapshots.read(spark, dir)
      .filter(col("key") >= 1000L && col("key") < 2000L)
    val scan = scanOf(df)
    assert(scan.metrics("numFiles").value === 1,
      "the renamed column's filter pruned via the physical-keyed stats")
    assert(df.count() === 1000L)
    // time travel reads the OLD name and still prunes
    val t = Snapshots.readAt(spark, dir, v1).filter(col("k") < 1000L)
    assert(scanOf(t).metrics("numFiles").value === 1)
    assert(t.count() === 1000L)
    // a merge rewrites one bucket; carried stats on kept files + fresh
    // stats on the new file keep the pruning exact
    Snapshots.merge(Seq((1500L, -1L, 1L)).toDF("key", "v", "bucket"),
      dir, "bucket", Seq("key"), Seq("key"))
    val after = Snapshots.read(spark, dir)
      .filter(col("key") >= 1000L && col("key") < 2000L)
    assert(scanOf(after).metrics("numFiles").value === 1)
    assert(after.count() === 1000L)
    assert(after.filter(col("key") === 1500L).select("v").as[Long].head() === -1L)
  }
}
