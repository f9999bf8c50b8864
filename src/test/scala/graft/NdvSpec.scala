package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ndv, Snapshots}

/** KMV NDV sketches: the EXACT-merge property (merge of per-file
  * sketches == the sketch of the union, bit for bit), exactness below
  * k, the deterministic error envelope, and the manifest integration
  * (incremental carry, delete tracking, rename interplay). */
class NdvSpec extends SparkSuite {

  import spark.implicits._

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_ndv_$name")
    d.toFile.deleteOnExit()
    d.toString + "/tbl"
  }

  test("EXACT-merge: merging per-file sketches equals the sketch computed " +
    "over the union, bit for bit; below k the estimate is EXACT") {
    val out = tmpDir("merge") + "_raw"
    // two files with overlapping value sets
    spark.range(0, 5000, 1, 1).select((col("id") % 3000).as("v"))
      .write.parquet(s"$out/a")
    spark.range(2000, 9000, 1, 1).select((col("id") % 3000 + 1500).as("v"))
      .write.parquet(s"$out/b")
    val both = spark.read.parquet(s"$out/a", s"$out/b")
    val perFile = Ndv.fileSketches(both, "v")
    assert(perFile.size === 2, "one sketch per file")
    val merged = Ndv.merge(perFile.values.toSeq)
    // the union sketch, computed directly: k smallest distinct hashes
    val direct = both.select(xxhash64(col("v")).as("h")).distinct()
      .orderBy("h").limit(Ndv.K).as[Long].collect()
    assert(merged.toSeq === direct.toSeq, "merge == sketch of the union")
    // exactness below k: 50 distinct values
    val tiny = spark.range(0, 1000, 1, 1).select((col("id") % 50).as("v"))
    tiny.write.parquet(s"$out/c")
    val sk = Ndv.fileSketches(spark.read.parquet(s"$out/c"), "v")
      .values.head
    assert(Ndv.estimate(sk) === ((50.0, true)), "below k: exact")
  }

  test("estimate error stays inside the 3-sigma envelope on known " +
    "cardinalities (deterministic — xxhash64 is fixed)") {
    val raw = tmpDir("err") + "_raw"
    for (n <- Seq(1000L, 10000L, 100000L)) {
      spark.range(0, 2 * n, 1, 4).select((col("id") % n).as("v"))
        .write.mode("overwrite").parquet(s"$raw/n$n")
      val sk = Ndv.merge(Ndv.fileSketches(
        spark.read.parquet(s"$raw/n$n"), "v").values.toSeq)
      val (est, exact) = Ndv.estimate(sk)
      assert(!exact)
      val rel = math.abs(est / n.toDouble - 1.0)
      // sigma ~ 1/sqrt(k-2) ~ 8.9%; 3 sigma ~ 27%
      assert(rel < 0.27, s"n=$n est=$est rel=$rel")
    }
  }

  test("manifest integration: sketches ride per FILE and carry forward " +
    "(appends sketch only new files), deletes move the estimate, and a " +
    "rename keeps them physical-keyed") {
    val dir = tmpDir("snap")
    val rows = spark.range(0, 4000, 1, 4).select(
        col("id").as("key"),
        (col("id") % 700).as("grp"))
      .withColumn("bucket", expr("key div 2000"))
    Snapshots.publish(rows, dir, "bucket", Seq("key"),
      ndvCols = Seq("key", "grp"))
    val m1 = Snapshots.manifest(spark, dir, 1L)
    assert(m1.ndvSketches("key").size === Snapshots.files(spark, dir, 1L).size)
    val (e1, x1) = Snapshots.approxDistinctAt(spark, dir, 1L, "key")
    assert(!x1 && math.abs(e1 / 4000.0 - 1.0) < 0.27, s"key ndv $e1")
    // grp has 700 distinct > k: estimated; check band
    val (eg, _) = Snapshots.approxDistinctAt(spark, dir, 1L, "grp")
    assert(math.abs(eg / 700.0 - 1.0) < 0.27, s"grp ndv $eg")
    // append: kept files' lines carry; only new files sketched
    Snapshots.append(rows.filter(col("key") < 100)
      .withColumn("key", col("key") + 10000L), dir, "bucket", Seq("key"))
    val m2 = Snapshots.manifest(spark, dir, 2L)
    assert(m2.ndvSketches("key").size === Snapshots.files(spark, dir, 2L).size)
    assert(m1.ndvSketches("key").forall { case (rel, sk) =>
      m2.ndvSketches("key")(rel).toSeq == sk.toSeq
    }, "carried sketches identical")
    val (e2, _) = Snapshots.approxDistinctAt(spark, dir, 2L, "key")
    assert(math.abs(e2 / 4100.0 - 1.0) < 0.27, s"after append $e2")
    // delete half the keys: rewritten buckets re-sketch, estimate drops
    Snapshots.delete(rows.filter(col("key") % 2 === 0).select("key", "bucket"),
      dir, "bucket", Seq("key"), Seq("key"))
    assert(Snapshots.manifest(spark, dir, 3L).ndvSketches("key").size ===
      Snapshots.files(spark, dir, 3L).size,
      "kept files' sketches CARRIED through the delete (4-field split pin)")
    val (e3, _) = Snapshots.approxDistinctAt(spark, dir, 3L, "key")
    assert(math.abs(e3 / 2100.0 - 1.0) < 0.27, s"after delete $e3")
    // rename: sketches stay keyed by the PHYSICAL name. Post-delete
    // grp coverage: odd keys yield the 350 odd residues (700 is even,
    // so residue parity == key parity), plus the appended rows' grp
    // values 0..99 contribute their 50 even ones — 400 distinct.
    val v4 = Snapshots.rename(spark, dir, "grp", "grp2")
    val exactGrp = Snapshots.read(spark, dir)
      .agg(countDistinct(col("grp2"))).as[Long].head()
    assert(exactGrp === 400L, s"residue arithmetic check: $exactGrp")
    val (e4, _) = Snapshots.approxDistinctAt(spark, dir, v4, "grp2")
    assert(math.abs(e4 / 400.0 - 1.0) < 0.27, s"renamed ndv $e4")
    // a column OUTSIDE the declared list falls back to the on-the-fly
    // sketch (verification path) and agrees with itself
    val (eb, _) = Snapshots.approxDistinctAt(spark, dir, v4, "bucket")
    assert(eb === 2.0, "bucket has 2 distinct values (exact below k)")
  }
}
