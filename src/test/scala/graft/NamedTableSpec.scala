package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{HashBucketedTable, NamedTables, Snapshots, ZOrderTable}

/** The DSv2 NAMED-table surface: `format("graft")` loads, versionAsOf
  * time travel, the filesystem TableCatalog (CREATE / INSERT / SELECT
  * / VERSION AS OF), the layout-dispatched read+insert, the
  * manifest-statistics broadcast through a NAMED SQL join, and the
  * streaming sink's exactly-once ledger. These run on a session built
  * WITH GraftExtensions over the shared SparkContext (the production
  * deployment shape — the resolution-rule half cannot late-bind);
  * the fresh-JVM conf wiring itself is tools.ExtCheck territory. */
class NamedTableSpec extends SparkSuite {

  import spark.implicits._

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_named_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  private val warehouse = tmpDir("wh")

  /** A session over the SAME SparkContext but built with
    * GraftExtensions + the graft catalog (extensions apply only at
    * builder time; the default/active session is restored after). */
  private lazy val ext: SparkSession = {
    val base = spark // force the shared session (and its context) first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      // withExtensions, not conf: spark.sql.extensions is a STATIC
      // conf read off the SparkContext — a builder .config cannot set
      // it once the shared context exists (ExtCheck covers the
      // conf-based fresh-JVM deployment)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.catalog.gcat", "graft.sources.GraftCatalog")
      .config("spark.sql.catalog.gcat.warehouse", warehouse)
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  test("format(\"graft\").load == the layout read bit-for-bit, with " +
    "versionAsOf time travel — derived layout columns never leak, and " +
    "a DV-erased table reads erased through the named surface too") {
    val dir = tmpDir("fmt") + "/tbl"
    val grid = ext.range(0, 5000, 1, 4).select(
      col("id"),
      (col("id") * 7919 % 65536).as("x"),
      (col("id") * 104729 % 65536).as("y"),
      (col("id") * 3).as("v"))
    ZOrderTable.publish(grid, dir, Seq("x", "y"), shift = 26)
    ZOrderTable.deleteVectored(
      grid.filter(col("id") % 701 === 0).select("id", "x", "y"),
      dir, Seq("id"))
    val named = ext.read.format("graft").load(dir)
    assert(named.columns.toSeq === Seq("id", "x", "y", "v"),
      "derived curve/bucket columns are not part of the named surface")
    val scala2 = ZOrderTable.read(ext, dir)
    assert(named.collect().toSet === scala2.collect().toSet)
    assert(named.filter(col("id") % 701 === 0).count() === 0,
      "the deletion vectors apply through the named read")
    // time travel via option — version 1 predates the erasure
    val v1 = ext.read.format("graft").option("versionAsOf", "1").load(dir)
    assert(v1.count() === 5000L)
    // the planner sees the manifest relation, not a V2 scan
    assert(named.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }.nonEmpty, "the rule swapped the V2 relation for the manifest one")
  }

  test("catalog: CREATE NAMESPACE + CREATE TABLE ... USING graft " +
    "TBLPROPERTIES(maintain.*) + INSERT INTO + SELECT + VERSION AS OF; " +
    "an undeclared flat table REFUSES inserts; DROP removes it") {
    ext.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
    ext.sql("""CREATE TABLE gcat.db.t (k BIGINT, v BIGINT, bucket BIGINT)
      USING graft TBLPROPERTIES(
        'maintain.bucket'='bucket', 'maintain.sort'='k')""")
    assert(ext.sql("SELECT * FROM gcat.db.t").count() === 0,
      "a freshly created table reads empty")
    ext.sql("INSERT INTO gcat.db.t SELECT id, id * 3, id % 4 " +
      "FROM range(0, 1000)")
    ext.sql("INSERT INTO gcat.db.t VALUES (5000, 1, 0), (5001, 2, 1)")
    assert(ext.sql("SELECT count(*) FROM gcat.db.t").head().getLong(0)
      === 1002L)
    assert(ext.sql("SELECT sum(v) FROM gcat.db.t WHERE k < 10")
      .head().getLong(0) === (0 until 10).map(_ * 3).sum.toLong)
    // versions: 1 = empty create, 2 = first insert, 3 = second
    assert(ext.sql("SELECT count(*) FROM gcat.db.t VERSION AS OF 2")
      .head().getLong(0) === 1000L)
    assert(ext.sql("SELECT count(*) FROM gcat.db.t VERSION AS OF 1")
      .head().getLong(0) === 0L)
    // the insert went through the staging path: props carried forward
    val dir = s"$warehouse/db/t"
    val props = Snapshots.propsAt(ext, dir, Snapshots.latest(ext, dir).get)
    assert(props.get("maintain.bucket") === Some("bucket") &&
      props.get("maintain.sort") === Some("k"),
      s"TBLPROPERTIES carried through the inserts: $props")
    // SHOW TABLES sees it; DROP removes it
    assert(ext.sql("SHOW TABLES IN gcat.db").collect()
      .map(_.getString(1)).contains("t"))
    // a layout-less, prop-less table refuses INSERT with the fix named
    ext.sql("CREATE TABLE gcat.db.bare (k BIGINT) USING graft")
    val e = intercept[Exception] {
      ext.sql("INSERT INTO gcat.db.bare VALUES (1)")
    }
    assert(e.getMessage.contains("maintain.bucket"), e.getMessage)
    ext.sql("DROP TABLE gcat.db.bare")
    intercept[Exception] { ext.sql("SELECT * FROM gcat.db.bare").collect() }
  }

  test("layout dispatch through the catalog: INSERT INTO a z-order and " +
    "a hash-bucketed table appends through the LAYOUT's own path (cells " +
    "and buckets derived, epochs stamped), and the named read drops the " +
    "derived columns") {
    val zdir = s"$warehouse/db/zt"
    ext.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
    ZOrderTable.publish(
      ext.range(0, 2000, 1, 4).select(col("id"),
        (col("id") * 7919 % 65536).as("x"),
        (col("id") * 104729 % 65536).as("y")),
      zdir, Seq("x", "y"), shift = 26)
    ext.sql("INSERT INTO gcat.db.zt SELECT id, (id * 7919) % 65536, " +
      "(id * 104729) % 65536 FROM range(2000, 3000)")
    assert(ext.sql("SELECT count(*) FROM gcat.db.zt").head().getLong(0)
      === 3000L)
    // the appended files carry the z epoch lines (the layout path ran)
    val vz = Snapshots.latest(ext, zdir).get
    val newFiles = Snapshots.files(ext, zdir, vz).toSet --
      Snapshots.files(ext, zdir, vz - 1).toSet
    val shifts = ZOrderTable.fileShifts(ext, zdir, vz)
    assert(newFiles.nonEmpty && newFiles.forall(shifts.contains),
      "the SQL insert staged through ZOrderTable.append (epoch lines)")
    assert(ext.sql("SELECT * FROM gcat.db.zt").columns.toSeq ===
      Seq("id", "x", "y"))
    // a hash table directly under the warehouse root (empty namespace)
    HashBucketedTable.publish(
      ext.range(0, 500, 1, 2).select(
        concat(lit("u"), col("id").cast("string")).as("key"),
        (col("id") * 2).as("n")),
      s"$warehouse/ht", "key", 8)
    ext.sql("INSERT INTO gcat.ht VALUES ('u9000', 77)")
    assert(ext.sql("SELECT n FROM gcat.ht WHERE key = 'u9000'")
      .head().getLong(0) === 77L)
    assert(ext.sql("SELECT count(*) FROM gcat.ht").head().getLong(0) === 501L)
  }

  test("manifest statistics drive a NAMED SQL join: fact JOIN dim " +
    "broadcasts under the default threshold, and stops broadcasting " +
    "when the threshold drops below the dim's manifest byte sum — the " +
    "planner is reading the MANIFEST's sizes") {
    ext.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
    val fdir = s"$warehouse/db/fact"
    val ddir = s"$warehouse/db/dim"
    Snapshots.publish(
      ext.range(0, 50000, 1, 4).select(col("id").as("k"),
        (col("id") * 31).as("payload"), (col("id") % 16).as("bucket")),
      fdir, "bucket", Seq("k"))
    Snapshots.publish(
      ext.range(0, 200, 1, 2).select(col("id").as("k"),
        format_string("d%04d", col("id")).as("name"),
        (col("id") % 4).as("bucket")),
      ddir, "bucket", Seq("k"))
    val dimBytes = Snapshots.sizeAt(ext, ddir, Snapshots.latest(ext, ddir).get)
    assert(dimBytes > 1024, s"fixture sanity: dim manifest sum $dimBytes")
    val q = "SELECT sum(f.payload) FROM gcat.db.fact f " +
      "JOIN gcat.db.dim d ON f.k = d.k"
    val bhj = ext.sql(q)
    assert(bhj.head().getLong(0) ===
      (0 until 200).map(_ * 31L).sum)
    assert(bhj.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "default threshold: the dim's manifest size is under 10MB -> broadcast")
    ext.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
    try {
      val smj = ext.sql(q)
      smj.collect()
      assert(!smj.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "threshold below the manifest byte sum -> no broadcast: the " +
          "decision is reading the manifest statistics")
    } finally ext.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("streaming sink writeStream.format(\"graft\"): microbatches land " +
    "through the exactly-once ledger, a RESTART from the checkpoint " +
    "applies only new batches, and a poisoned replay of an applied id " +
    "is absorbed (the q167 discipline as the DEFAULT sink)") {
    val dir = tmpDir("sink") + "/tbl"
    val srcDir = tmpDir("sinksrc")
    val ckpt = tmpDir("sinkck")
    def srcBatch(lo: Long, hi: Long, tag: Long): Unit =
      ext.range(lo, hi, 1, 2).select(col("id").as("k"),
        lit(tag).as("v"), (col("id") % 4).as("bucket"))
        .write.mode("append").parquet(srcDir)
    def schema = ext.read.parquet(srcDir).schema
    def run(): Unit = {
      val q = ext.readStream.schema(schema).parquet(srcDir)
        .writeStream.format("graft")
        .option("path", dir)
        .option("keys", "k").option("bucket", "bucket")
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    srcBatch(0, 100, 1L)
    run()
    assert(Snapshots.appliedBatches(ext, dir) === Set(0L))
    assert(Snapshots.read(ext, dir).count() === 100L)
    // RESTART with new source data: only the new batch applies
    srcBatch(100, 150, 2L)
    run()
    assert(Snapshots.appliedBatches(ext, dir) === Set(0L, 1L))
    assert(Snapshots.read(ext, dir).count() === 150L)
    assert(Snapshots.read(ext, dir).filter(col("v") === 2L).count() === 50L)
    // a replayed id with POISONED content is absorbed by the ledger
    val vBefore = Snapshots.latest(ext, dir).get
    Snapshots.mergeBatch(1L,
      ext.range(0, 10).select(col("id").as("k"), lit(-999L).as("v"),
        (col("id") % 4).as("bucket")),
      dir, "bucket", Seq("k"), Seq("k"))
    assert(Snapshots.latest(ext, dir).get === vBefore,
      "the replay committed nothing")
    assert(Snapshots.read(ext, dir).filter(col("v") === -999L).count() === 0)
    // upsert semantics across batches: re-keying through a THIRD batch
    srcBatch(0, 10, 9L)
    run()
    assert(Snapshots.read(ext, dir).count() === 150L,
      "re-keyed rows merged, not duplicated")
    assert(Snapshots.read(ext, dir)
      .filter(col("k") < 10 && col("v") === 9L).count() === 10L)
  }

  test("SQL DELETE FROM is a MERGE-ON-READ delete on ANY layout: " +
    "IN-list and range predicates commit deletion vectors (zero files " +
    "written), time travel reads the pre-delete state, file pruning " +
    "fires off the pushed predicate, and a rewrite-scale delete " +
    "refuses toward copy-on-write") {
    ext.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
    ext.sql("""CREATE TABLE gcat.db.del (k BIGINT, v BIGINT, bucket BIGINT)
      USING graft TBLPROPERTIES(
        'maintain.bucket'='bucket', 'maintain.sort'='k')""")
    ext.sql("INSERT INTO gcat.db.del SELECT id, id * 3, id % 4 " +
      "FROM range(0, 2000)")
    val dDir = s"$warehouse/db/del"
    val filesPre = Snapshots.files(ext, dDir, Snapshots.latest(ext, dDir).get)
    // the GDPR headline: an IN-list of ids
    ext.sql("DELETE FROM gcat.db.del WHERE k IN (3, 700, 1500, 1999)")
    assert(Snapshots.files(ext, dDir, Snapshots.latest(ext, dDir).get)
      === filesPre, "metadata-only: same data files")
    assert(ext.sql("SELECT count(*) FROM gcat.db.del").head().getLong(0)
      === 1996L)
    assert(ext.sql(
      "SELECT count(*) FROM gcat.db.del WHERE k IN (3, 700, 1500, 1999)")
      .head().getLong(0) === 0L)
    // a range + conjunction predicate
    ext.sql("DELETE FROM gcat.db.del WHERE k >= 100 AND k < 110")
    assert(ext.sql("SELECT count(*) FROM gcat.db.del").head().getLong(0)
      === 1986L)
    assert(ext.sql("SELECT count(*) FROM gcat.db.del VERSION AS OF 2")
      .head().getLong(0) === 2000L, "time travel across the deletes")
    // a z-layout table deletes the same way — positions are
    // layout-agnostic
    val zdir = s"$warehouse/db/zdel"
    ZOrderTable.publish(
      ext.range(0, 3000, 1, 4).select(col("id"),
        (col("id") * 7919 % 65536).as("x"),
        (col("id") * 104729 % 65536).as("y")),
      zdir, Seq("x", "y"), shift = 26)
    val zFilesPre = Snapshots.files(ext, zdir, Snapshots.latest(ext, zdir).get)
    ext.sql("DELETE FROM gcat.db.zdel WHERE id IN (5, 55, 555)")
    assert(Snapshots.files(ext, zdir, Snapshots.latest(ext, zdir).get)
      === zFilesPre)
    assert(ext.sql("SELECT count(*) FROM gcat.db.zdel").head().getLong(0)
      === 2997L)
    // rewrite-scale (unfiltered-ish) deletes refuse once a file's
    // vector would exceed the inline budget — exercised through the
    // Scala surface on a 1.1M-row single-bucket table
    val bigDir = tmpDir("delbig") + "/tbl"
    Snapshots.publish(
      ext.range(0, 1100000, 1, 4).select(col("id").as("k"),
        lit(0L).as("bucket")), bigDir, "bucket", Seq("k"))
    val e = intercept[IllegalArgumentException] {
      Snapshots.deleteWhere(ext, bigDir, col("k") % 21 =!= 0)
    }
    assert(e.getMessage.contains("copy-on-write"), e.getMessage)
    assert(Snapshots.versions(ext, bigDir) === Seq(1L),
      "the refused delete committed nothing")
  }

  test("SQL writes round out: INSERT OVERWRITE replaces a flat table's " +
    "head (time travel intact, props carried) and REFUSES on clustered " +
    "layouts; ALTER TABLE SET/UNSET TBLPROPERTIES and RENAME COLUMN " +
    "pass through to the format's metadata-only commits") {
    ext.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
    ext.sql("""CREATE TABLE gcat.db.ow (k BIGINT, v BIGINT, bucket BIGINT)
      USING graft TBLPROPERTIES(
        'maintain.bucket'='bucket', 'maintain.sort'='k')""")
    ext.sql("INSERT INTO gcat.db.ow SELECT id, id, id % 4 FROM range(0, 100)")
    ext.sql("INSERT OVERWRITE gcat.db.ow " +
      "SELECT id, id * 10, id % 2 FROM range(0, 30)")
    assert(ext.sql("SELECT count(*), sum(v) FROM gcat.db.ow").head()
      .toSeq === Seq(30L, (0 until 30).map(_ * 10L).sum))
    assert(ext.sql("SELECT count(*) FROM gcat.db.ow VERSION AS OF 2")
      .head().getLong(0) === 100L,
      "time travel reads the pre-overwrite state")
    val owDir = s"$warehouse/db/ow"
    assert(Snapshots.propsAt(ext, owDir, Snapshots.latest(ext, owDir).get)
      .get("maintain.bucket") === Some("bucket"), "props survive overwrite")
    // a clustered layout refuses the overwrite with the story
    HashBucketedTable.publish(
      ext.range(0, 50).select(col("id").cast("string").as("key"),
        col("id").as("n")),
      s"$warehouse/db/owh", "key", 4)
    val e = intercept[Exception] {
      ext.sql("INSERT OVERWRITE gcat.db.owh SELECT 'x', 1")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("re-publish")), e.toString)
    // ALTER TABLE passthrough: properties + column rename
    ext.sql("ALTER TABLE gcat.db.ow SET TBLPROPERTIES(" +
      "'retainversions'='2')")
    assert(Snapshots.propsAt(ext, owDir, Snapshots.latest(ext, owDir).get)
      .get("retainversions") === Some("2"))
    ext.sql("ALTER TABLE gcat.db.ow UNSET TBLPROPERTIES('retainversions')")
    assert(!Snapshots.propsAt(ext, owDir, Snapshots.latest(ext, owDir).get)
      .contains("retainversions"))
    // ATOMIC: a statement with one valid and one invalid key commits
    // NOTHING (validation runs before any commit; all props land in
    // one commit)
    val vPreAtomic = Snapshots.latest(ext, owDir).get
    intercept[Exception] {
      ext.sql("ALTER TABLE gcat.db.ow SET TBLPROPERTIES(" +
        "'good'='1', 'bad:key'='2')")
    }
    assert(Snapshots.latest(ext, owDir).get === vPreAtomic,
      "the refused statement committed nothing")
    assert(!Snapshots.propsAt(ext, owDir, vPreAtomic).contains("good"),
      "not even the valid key of a refused statement applies")
    ext.sql("ALTER TABLE gcat.db.ow SET TBLPROPERTIES('p1'='a','p2'='b')")
    assert(Snapshots.latest(ext, owDir).get === vPreAtomic + 1,
      "a multi-key SET is ONE commit, not one per key")
    ext.sql("ALTER TABLE gcat.db.ow RENAME COLUMN v TO val")
    assert(ext.sql("SELECT sum(val) FROM gcat.db.ow").head().getLong(0) ===
      (0 until 30).map(_ * 10L).sum)
    assert(ext.sql("SELECT * FROM gcat.db.ow VERSION AS OF 3").columns
      .toSeq === Seq("k", "v", "bucket"),
      "pre-rename versions read under their own names")
    // ATOMIC across change KINDS: a statement mixing a valid SET with
    // a refusable RENAME (missing source column) commits NOTHING —
    // renames run after the property commit, so they pre-validate
    // against the current schema before anything lands. (Spark's SQL
    // parser carries SET and RENAME as separate statements; the mixed
    // shape arrives through the TableCatalog API.)
    val cat0 = ext.sessionState.catalogManager.catalog("gcat")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val owIdent = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("db"), "ow")
    val vPre2 = Snapshots.latest(ext, owDir).get
    val e2 = intercept[Exception] {
      cat0.alterTable(owIdent,
        org.apache.spark.sql.connector.catalog.TableChange
          .setProperty("should.not.land", "1"),
        org.apache.spark.sql.connector.catalog.TableChange
          .renameColumn(Array("no_such_col"), "whatever"))
    }
    assert(e2.getMessage.contains("no column no_such_col"), e2.getMessage)
    assert(Snapshots.latest(ext, owDir).get === vPre2,
      "a refusable rename refuses the WHOLE statement — no commit")
    assert(!Snapshots.propsAt(ext, owDir, vPre2).contains("should.not.land"),
      "the valid property half of the refused statement never lands")
    // ... and the Scala API's overwrite carries the same layout
    // refusal as the SQL path (the guard lives in Snapshots.overwrite)
    val e3 = intercept[IllegalArgumentException] {
      Snapshots.overwrite(
        ext.range(0, 5).select(col("id").cast("string").as("key"),
          col("id").as("n")),
        s"$warehouse/db/owh", "n", Seq("key"))
    }
    assert(e3.getMessage.contains("hash-layout"), e3.getMessage)
    assert(e3.getMessage.contains("re-publish"), e3.getMessage)
  }

  test("catalog identifier segments are PATH-validated: '..', '/' and " +
    "other escape shapes refuse — a backticked identifier can never " +
    "resolve (or DROP) outside the warehouse root") {
    ext.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
    val escapes = Seq("SELECT * FROM gcat.`..`.t",
      "DROP NAMESPACE gcat.`..` CASCADE",
      "DROP TABLE gcat.db.`../../etc`",
      "CREATE NAMESPACE gcat.`a/b`")
    escapes.foreach { q =>
      val e = intercept[Exception] { ext.sql(q).collect() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("identifier segment")),
        s"'$q' must refuse with the segment validation, got: $e")
    }
    // a NUL-carrying segment refuses too (the validation literal is
    // written escaped — the source file must stay diffable text)
    val nulE = intercept[Exception] {
      ext.sessionState.catalogManager.catalog("gcat")
        .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
        .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
          Array("db"), "a\u0000b"))
    }
    assert(nulE.getMessage.contains("identifier segment"), nulE.getMessage)
    // DROP TABLE returns the contract's boolean: true iff deleted
    ext.sql("CREATE TABLE gcat.db.droppable (k BIGINT) USING graft")
    val cat = ext.sessionState.catalogManager.catalog("gcat")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("db"), "droppable")
    assert(cat.dropTable(ident) === true, "a real table deletes -> true")
    assert(cat.dropTable(ident) === false, "already gone -> false")
  }

  test("NamedTables guards: reading a non-table refuses; insertInto a " +
    "versioned read is impossible through the API; the layout detector " +
    "answers for all four families") {
    val dir = tmpDir("guards") + "/nope"
    intercept[IllegalArgumentException] {
      NamedTables.readNamed(ext, dir)
    }
    val flat = tmpDir("guards") + "/flat"
    Snapshots.publish(
      ext.range(0, 10).select(col("id").as("k"), (col("id") % 2).as("bucket")),
      flat, "bucket", Seq("k"))
    assert(NamedTables.layoutAt(ext, flat, 1L) === "flat")
    intercept[IllegalArgumentException] {
      NamedTables.insertInto(ext, flat,
        ext.range(0, 5).select(col("id").as("k"), lit(0L).as("bucket")))
    }
  }

  test("TIMESTAMP AS OF: every commit stamps its wall time (#ts, " +
    "injected clock here), resolution picks the newest stamped commit " +
    "<= t with the MONOTONIC adjustment for writer-clock skew, " +
    "before-first refuses with the range, after-latest reads the head — " +
    "through the catalog SQL, the format option, and the Scala API") {
    ext.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
    val dir = s"$warehouse/db/tt"
    val rows = ext.range(0, 300, 1, 2).select(col("id").as("k"),
      (col("id") % 4).as("bucket"))
    ext.conf.set(Snapshots.TestClockKey, "1000000")
    try {
      Snapshots.publish(rows.filter(col("k") < 100), dir, "bucket", Seq("k"))
      ext.conf.set(Snapshots.TestClockKey, "2000000")
      Snapshots.append(rows.filter(col("k") >= 100 && col("k") < 200),
        dir, "bucket", Seq("k"))
      // a writer whose clock runs BEHIND stamps an earlier time — the
      // recorded line keeps the lie, resolution adjusts to pred + 1µs
      ext.conf.set(Snapshots.TestClockKey, "1500000")
      Snapshots.append(rows.filter(col("k") >= 200), dir, "bucket", Seq("k"))
    } finally ext.conf.unset(Snapshots.TestClockKey)
    assert(Snapshots.commitTsAt(ext, dir, 3L) === Some(1500000L),
      "the recorded timestamp is never rewritten")
    // resolution: exact, between, skew-adjusted, after-latest
    assert(Snapshots.versionAtTimestamp(ext, dir, 1000000L) === 1L)
    assert(Snapshots.versionAtTimestamp(ext, dir, 1999999L) === 1L)
    assert(Snapshots.versionAtTimestamp(ext, dir, 2000000L) === 2L)
    assert(Snapshots.versionAtTimestamp(ext, dir, 2000001L) === 3L,
      "the skewed commit resolves as predecessor + 1µs")
    assert(Snapshots.versionAtTimestamp(ext, dir, Long.MaxValue) === 3L)
    val e = intercept[IllegalArgumentException] {
      Snapshots.versionAtTimestamp(ext, dir, 999999L)
    }
    assert(e.getMessage.contains("earliest stamped commit"), e.getMessage)
    // catalog SQL TIMESTAMP AS OF (micros arrive through the V2
    // loadTable(ident, timestamp) hook; timestamp_micros is tz-free)
    assert(ext.sql("SELECT count(*) FROM gcat.db.tt " +
      "TIMESTAMP AS OF timestamp_micros(2000000)").head().getLong(0) === 200L)
    assert(ext.sql("SELECT count(*) FROM gcat.db.tt " +
      "TIMESTAMP AS OF timestamp_micros(1000000)").head().getLong(0) === 100L)
    intercept[Exception] {
      ext.sql("SELECT count(*) FROM gcat.db.tt " +
        "TIMESTAMP AS OF timestamp_micros(5)").collect()
    }
    // the format option: micros and the Delta-style local string
    assert(ext.read.format("graft").option("timestampAsOf", "2000000")
      .load(dir).count() === 200L)
    val future = new java.sql.Timestamp(
      System.currentTimeMillis() + 3600000L).toString
    assert(ext.read.format("graft").option("timestampAsOf", future)
      .load(dir).count() === 300L,
      "a local-string timestamp after the last commit reads the head")
    // a METADATA-ONLY commit (ALTER ... SET TBLPROPERTIES → setProps)
    // stamps ITS OWN wall time: its carry is a BLACKLIST over the
    // predecessor's meta and #ts must be on it, or the props commit
    // inherits the predecessor's stamp and TIMESTAMP AS OF resolves
    // a version that did not exist at that time
    ext.conf.set(Snapshots.TestClockKey, "4000000")
    try Snapshots.setProp(ext, dir, "note", Some("r13"))
    finally ext.conf.unset(Snapshots.TestClockKey)
    assert(Snapshots.commitTsAt(ext, dir, 4L) === Some(4000000L),
      "props-only commits stamp fresh, never carry the predecessor's ts")
    assert(Snapshots.versionAtTimestamp(ext, dir, 3999999L) === 3L,
      "just before the ALTER still reads the pre-ALTER version")
  }

  test("streaming READ by name: format(\"graft\").option(changeFeed) is " +
    "the CDC feed bit-for-bit (== ChangeFeed.readStream, pacing options " +
    "included); a catalog ident streams as the APPEND-ONLY tail under " +
    "the table's own schema, a checkpoint restart replays nothing, and " +
    "a non-append change refuses instead of silently dropping deletes") {
    import graft.streaming.ChangeFeed
    ext.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
    val dir = s"$warehouse/db/st"
    val rows = ext.range(0, 600, 1, 2).select(col("id").as("k"),
      (col("id") * 31L).as("payload"), (col("id") % 3).as("bucket"))
    Snapshots.publish(rows.filter(col("k") < 200), dir, "bucket", Seq("k"))
    Snapshots.append(rows.filter(col("k") >= 200 && col("k") < 400),
      dir, "bucket", Seq("k"))
    Snapshots.deleteVectored(
      rows.filter(col("k") % 97 === 0).select("k", "bucket"),
      dir, "bucket", Seq("k"))
    def drain(df: org.apache.spark.sql.DataFrame, name: String,
              ckpt: Option[String] = None): Seq[Seq[Any]] = {
      val w = df.writeStream.outputMode("append")
        .format("memory").queryName(name)
      val q = ckpt.fold(w)(c => w.option("checkpointLocation", c)).start()
      try q.processAllAvailable() finally q.stop()
      ext.table(name).collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    }
    // CDC by short name == the class-name path, pacing option included
    val byName = drain(ext.readStream.format("graft")
      .option("changeFeed", "true").option("maxVersionsPerBatch", "1")
      .load(dir), "st_byname")
    val byClass = drain(
      ChangeFeed.readStream(ext, dir, maxVersionsPerBatch = 1), "st_byclass")
    assert(byName === byClass, "the named CDC stream is the change feed")
    assert(byName.nonEmpty && byName.head.size === 5,
      "_change/_version ride the named feed")
    // APPEND-ONLY tail by CATALOG IDENT: the pre-delete versions
    // stream the inserted rows under the TABLE schema...
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_st_ck").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def runTail(): Unit = {
      val q = ext.readStream.option("maxVersionsPerBatch", "1")
        .table("gcat.db.st")
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("k").collect().foreach(r => seen.add(r.getLong(0)))
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    // v3 is the DV commit (a non-append change): start the tail at a
    // fresh twin WITHOUT the delete to prove the happy path first
    val dir2 = s"$warehouse/db/st2"
    Snapshots.publish(rows.filter(col("k") < 200), dir2, "bucket", Seq("k"))
    Snapshots.append(rows.filter(col("k") >= 200 && col("k") < 400),
      dir2, "bucket", Seq("k"))
    ext.sql("SELECT 1").collect() // catalog warm (no-op, readability)
    val ckpt2 = java.nio.file.Files
      .createTempDirectory("graft_st_ck2").toString
    def runTail2(): Unit = {
      val q = ext.readStream.table("gcat.db.st2")
        .writeStream.option("checkpointLocation", ckpt2)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("k").collect().foreach(r => seen.add(r.getLong(0)))
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    runTail2()
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSeq.sorted === (0L until 400L),
      "the tail replays every inserted row exactly once")
    seen.clear()
    // ...a restart replays NOTHING, and a new append streams only
    // its own rows
    runTail2()
    assert(seen.asScala.isEmpty, "checkpoint restart replays nothing")
    Snapshots.append(rows.filter(col("k") >= 400), dir2, "bucket", Seq("k"))
    runTail2()
    assert(seen.asScala.toSeq.sorted === (400L until 600L),
      "only the new version's rows arrive after the restart")
    // the DV-bearing table refuses the append-only tail at the
    // non-append version, naming the fix
    val e = intercept[Exception] { runTail() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("NON-APPEND") &&
      m.contains("changeFeed")), e.toString)
  }

  test("SQL MERGE INTO, the general copy-on-write shape on a flat " +
    "table: conditional matched DELETE + matched UPDATE + NOT MATCHED " +
    "INSERT + NOT-MATCHED-BY-SOURCE DELETE fire by first-match order in " +
    "ONE commit; time travel reads the pre-merge state; partial UPDATE " +
    "SET keeps unassigned columns; cardinality violations refuse") {
    ext.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
    ext.sql("""CREATE TABLE gcat.db.mg (k BIGINT, v BIGINT, bucket BIGINT)
      USING graft TBLPROPERTIES(
        'maintain.bucket'='bucket', 'maintain.sort'='k')""")
    ext.sql("INSERT INTO gcat.db.mg SELECT id, id * 2, id % 4 " +
      "FROM range(0, 100)")
    val dir = s"$warehouse/db/mg"
    val vPre = Snapshots.latest(ext, dir).get
    ext.sql("""MERGE INTO gcat.db.mg AS t
      USING (SELECT id AS k, id * 10 AS v, id % 4 AS bucket
             FROM range(50, 150)) AS s
      ON t.k = s.k
      WHEN MATCHED AND s.k < 60 THEN DELETE
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
      WHEN NOT MATCHED BY SOURCE AND t.k < 5 THEN DELETE""")
    val got = ext.sql("SELECT k, v FROM gcat.db.mg ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = (5L to 49L).map(k => (k, k * 2)) ++
      (60L to 149L).map(k => (k, k * 10))
    assert(got === want,
      "first-match order: the k<60 delete wins over the update; NMBS " +
        "prunes k<5; inserts extend to 149")
    assert(Snapshots.latest(ext, dir).get === vPre + 1,
      "the whole statement is ONE commit")
    assert(ext.sql(s"SELECT count(*) FROM gcat.db.mg VERSION AS OF $vPre")
      .head().getLong(0) === 100L, "time travel across the merge")
    // partial UPDATE SET: only the assigned column changes
    ext.sql("""MERGE INTO gcat.db.mg AS t
      USING (SELECT 7L AS k) AS s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = -1""")
    assert(ext.sql("SELECT v, bucket FROM gcat.db.mg WHERE k = 7")
      .head().toSeq === Seq(-1L, 3L),
      "unassigned columns survive a partial UPDATE SET")
    // cardinality: two source rows matching one target row refuse on
    // the GENERAL path too (an action condition forces the shape)
    val e = intercept[Exception] {
      ext.sql("""MERGE INTO gcat.db.mg AS t
        USING (SELECT 8L AS k, 0L AS v UNION ALL SELECT 8L, 1L) AS s
        ON t.k = s.k
        WHEN MATCHED AND s.v >= 0 THEN UPDATE SET v = s.v""")
    }
    assert(e.getMessage.contains("cardinality"), e.getMessage)
    // ... and the statement committed NOTHING
    assert(ext.sql("SELECT v FROM gcat.db.mg WHERE k = 8").head()
      .getLong(0) === 16L)
    // WITH SCHEMA EVOLUTION EVOLVES (r13 — it refused through r12):
    // the analyzer widens the table through the catalog and the merge
    // lands the new column; the dedicated evolution test covers the
    // mechanics, this pins that the general-shape table takes it too
    ext.sql("""MERGE WITH SCHEMA EVOLUTION INTO gcat.db.mg AS t
      USING (SELECT 9L AS k, -5L AS v, 1L AS bucket, 'x' AS extra) AS s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *""")
    assert(ext.sql("SELECT v, extra FROM gcat.db.mg WHERE k = 9")
      .head().toSeq === Seq(-5L, "x"))
    assert(ext.sql(
      "SELECT count(*) FROM gcat.db.mg WHERE extra IS NULL")
      .head().getLong(0) ===
      ext.sql("SELECT count(*) FROM gcat.db.mg").head().getLong(0) - 1,
      "every pre-evolution row null-fills the evolved column")
  }

  test("maintenance SQL: OPTIMIZE compacts by LAYOUT dispatch (flat " +
    "and z, ident- and path-addressed), VACUUM drops history by version " +
    "retention (refusing without a declared retention — destructive ops " +
    "never guess), and DESCRIBE HISTORY reads the manifest-only frame " +
    "with commit timestamps") {
    import graft.sources.GraftSqlParser
    ext.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
    ext.sql("""CREATE TABLE gcat.db.mx (k BIGINT, v BIGINT, bucket BIGINT)
      USING graft TBLPROPERTIES(
        'maintain.bucket'='bucket', 'maintain.sort'='k')""")
    for (i <- 0 until 3)
      ext.sql(s"INSERT INTO gcat.db.mx SELECT id, id, id % 2 " +
        s"FROM range(${i * 100}, ${i * 100 + 100})")
    val dir = s"$warehouse/db/mx"
    // DESCRIBE HISTORY: create + 3 inserts, stamped and ordered
    val h = ext.sql("DESCRIBE HISTORY gcat.db.mx").collect()
    assert(h.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    val ts = h.map(_.getLong(1))
    assert(ts.forall(_ > 0L) && ts.sorted.toSeq === ts.toSeq,
      "every version carries its commit wall time, non-decreasing")
    // OPTIMIZE: three fragments per bucket fold to one file per bucket
    val o = ext.sql("OPTIMIZE gcat.db.mx").collect().head
    assert(o.getString(0) === "flat" && o.getBoolean(3), o.toString)
    assert(Snapshots.latest(ext, dir).get === 5L &&
      Snapshots.files(ext, dir, 5L).size === 2,
      "one compaction commit, one file per bucket")
    val o2 = ext.sql("OPTIMIZE gcat.db.mx").collect().head
    assert(!o2.getBoolean(3) && Snapshots.latest(ext, dir).get === 5L,
      "nothing fragmented — OPTIMIZE is a commit-free no-op")
    // VACUUM with no RETAIN and no retainversions property refuses
    val e = intercept[Exception] { ext.sql("VACUUM gcat.db.mx").collect() }
    assert(e.getMessage.contains("RETAIN"), e.getMessage)
    assert(Snapshots.versions(ext, dir).size === 5)
    // explicit retention (mtime guard off: exclusive access here)
    ext.conf.set(GraftSqlParser.VacuumRetainMsKey, "0")
    try {
      val v = ext.sql("VACUUM gcat.db.mx RETAIN 2 VERSIONS").collect().head
      assert(v.getLong(0) === 4L && v.getLong(1) === 3L,
        s"keep the newest two versions, drop three: $v")
    } finally ext.conf.unset(GraftSqlParser.VacuumRetainMsKey)
    assert(Snapshots.versions(ext, dir) === Seq(4L, 5L))
    assert(ext.sql("SELECT count(*) AS n, sum(v) AS s FROM gcat.db.mx")
      .head().toSeq === Seq(300L, (0L until 300L).sum),
      "vacuum dropped HISTORY, never the live content")
    // layout dispatch + path addressing: a fragmented z table
    // compacts through ZOrderTable.compact, addressed by PATH
    val zdir = s"$warehouse/db/mzc"
    def zRows(a: Long, b: Long) =
      ext.range(a, b, 1, 2).select(col("id"),
        (col("id") * 7919 % 65536).as("x"),
        (col("id") * 104729 % 65536).as("y"))
    ZOrderTable.publish(zRows(0, 2000), zdir, Seq("x", "y"), shift = 26)
    ext.sql("INSERT INTO gcat.db.mzc SELECT id, (id * 7919) % 65536, " +
      "(id * 104729) % 65536 FROM range(2000, 4000)")
    val oz = ext.sql(s"OPTIMIZE '$zdir'").collect().head
    assert(oz.getString(0) === "z", oz.toString)
    assert(ext.sql("SELECT count(*) FROM gcat.db.mzc").head().getLong(0)
      === 4000L)
  }

  test("ATOMIC CTAS and HISTORY-PRESERVING REPLACE (StagingTableCatalog, " +
    "the Delta staged shape): CREATE TABLE ... AS SELECT is ONE commit " +
    "(the table exists complete or not at all), REPLACE TABLE lands one " +
    "head-replacing version with every earlier version still " +
    "time-travelable, a failing RTAS aborts leaving the table untouched, " +
    "SHOW TBLPROPERTIES / SHOW CREATE TABLE read the carried props, and " +
    "writeStream.toTable refuses loudly") {
    ext.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
    ext.sql("""CREATE TABLE gcat.db.cts USING graft TBLPROPERTIES(
      'maintain.bucket'='b', 'maintain.sort'='k')
      AS SELECT id AS k, id * 2 AS v, id % 4 AS b FROM range(0, 100)""")
    assert(ext.sql("SELECT count(*), sum(v) FROM gcat.db.cts")
      .head().toSeq === Seq(100L, 2L * (0L until 100L).sum))
    val dir = s"$warehouse/db/cts"
    assert(Snapshots.versions(ext, dir) === Seq(1L),
      "atomic CTAS: schema + props + data in ONE version")
    assert(ext.sql("SHOW TBLPROPERTIES gcat.db.cts").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
      .get("maintain.bucket") === Some("b"),
      "the CTAS TBLPROPERTIES carried into the manifest")
    assert(ext.sql("SHOW CREATE TABLE gcat.db.cts").head().getString(0)
      .contains("USING graft"))
    // REPLACE TABLE: one head-replacing commit (Delta's semantics) —
    // the new definition's schema/props/data, the OLD versions intact
    ext.sql("""REPLACE TABLE gcat.db.cts USING graft TBLPROPERTIES(
      'maintain.bucket'='b', 'maintain.sort'='k')
      AS SELECT id AS k, id * 3 AS v, id % 4 AS b FROM range(0, 40)""")
    assert(ext.sql("SELECT count(*), sum(v) FROM gcat.db.cts")
      .head().toSeq === Seq(40L, 3L * (0L until 40L).sum))
    assert(Snapshots.versions(ext, dir) === Seq(1L, 2L),
      "REPLACE is a VERSION, not a recreate")
    assert(ext.sql("SELECT count(*), sum(v) FROM gcat.db.cts " +
      "VERSION AS OF 1").head().toSeq ===
      Seq(100L, 2L * (0L until 100L).sum),
      "time travel reads ACROSS the replace")
    // a failing RTAS ABORTS: table state and data-file set untouched
    val dataFiles: Set[String] = {
      def walk(f: java.io.File): Seq[String] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else Seq(f.getPath)
      walk(new java.io.File(s"$dir/data")).toSet
    }
    intercept[Exception] {
      ext.sql("""REPLACE TABLE gcat.db.cts USING graft TBLPROPERTIES(
        'maintain.bucket'='b', 'maintain.sort'='k')
        AS SELECT raise_error('boom') AS k, id AS v, id AS b
        FROM range(0, 10)""")
    }
    assert(Snapshots.versions(ext, dir) === Seq(1L, 2L) &&
      ext.sql("SELECT count(*) FROM gcat.db.cts").head().getLong(0) === 40L,
      "the failed replace committed nothing")
    val after: Set[String] = {
      def walk(f: java.io.File): Seq[String] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else Seq(f.getPath)
      walk(new java.io.File(s"$dir/data")).toSet
    }
    assert(after === dataFiles,
      "abort cleaned the staged files — no invisible garbage")
    // streaming by IDENT refuses — the named table is not a streaming
    // sink; writeStream.format("graft").option("path", dir) is
    val ck = tmpDir("cts_ck")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = ext.sqlContext
    val ms = MemoryStream[Long]
    ms.addData(1L, 2L)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      ms.toDF().select(col("value").as("k"), (col("value") * 2).as("v"),
          (col("value") % 4).as("b"))
        .writeStream.option("checkpointLocation", ck)
        .option("keys", "k").option("bucket", "b")
        .toTable("gcat.db.cts")
    }
    assert(e.getMessage.contains("streaming write"), e.getMessage)
  }

  test("MERGE ... WITH SCHEMA EVOLUTION widens the TABLE through the " +
    "catalog (AUTOMATIC_SCHEMA_EVOLUTION → ResolveMergeIntoSchemaEvolution " +
    "→ alterTable → ONE metadata-only evolveSchema commit): a new source " +
    "column lands nullable with history null-filling, files never " +
    "rewrite, time travel reads the PRE-evolution schema, and ALTER " +
    "TABLE ADD COLUMNS / ALTER COLUMN TYPE widen standalone") {
    ext.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
    ext.sql("""CREATE TABLE gcat.db.mse (k BIGINT, v INT, bucket BIGINT)
      USING graft TBLPROPERTIES(
        'maintain.bucket'='bucket', 'maintain.sort'='k')""")
    ext.sql("INSERT INTO gcat.db.mse SELECT id, CAST(id * 2 AS INT), " +
      "id % 2 FROM range(0, 10)")
    val dir = s"$warehouse/db/mse"
    val vPre = Snapshots.latest(ext, dir).get
    val preFiles = Snapshots.files(ext, dir, vPre)
    ext.sql("""MERGE WITH SCHEMA EVOLUTION INTO gcat.db.mse AS t
      USING (SELECT id AS k, CAST(id * 2 AS INT) AS v, id % 2 AS bucket,
               concat('x', CAST(id AS STRING)) AS extra
             FROM range(5, 15)) AS s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(ext.table("gcat.db.mse").columns.toSeq ===
      Seq("k", "v", "bucket", "extra"),
      "the source's new column evolved INTO the table schema")
    val got = ext.sql(
      "SELECT k, extra FROM gcat.db.mse ORDER BY k").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(got === (0L to 4L).map(k => (k, None)) ++
      (5L to 14L).map(k => (k, Some(s"x$k"))),
      "untouched history null-fills; merged rows carry the new column")
    // the evolution itself was ONE metadata-only commit before the
    // merge's write: same files as vPre, new schema
    assert(Snapshots.files(ext, dir, vPre + 1) === preFiles,
      "evolveSchema rewrote NOTHING")
    assert(Snapshots.latest(ext, dir).get === vPre + 2,
      "evolution commit + merge commit")
    assert(ext.sql(s"SELECT * FROM gcat.db.mse VERSION AS OF $vPre")
      .columns.toSeq === Seq("k", "v", "bucket"),
      "time travel reads the PRE-evolution schema")
    // standalone DDL: ADD COLUMNS and lossless ALTER COLUMN TYPE
    ext.sql("ALTER TABLE gcat.db.mse ADD COLUMNS (note STRING)")
    ext.sql("ALTER TABLE gcat.db.mse ALTER COLUMN v TYPE BIGINT")
    val sch = ext.table("gcat.db.mse").schema
    assert(sch.fieldNames.toSeq === Seq("k", "v", "bucket", "extra", "note"))
    assert(sch("v").dataType === org.apache.spark.sql.types.LongType,
      "INT widened losslessly to BIGINT — old int32 files read natively")
    assert(ext.sql("SELECT sum(v) FROM gcat.db.mse").head().getLong(0) ===
      (0L to 4L).map(_ * 2).sum + (5L to 14L).map(_ * 2).sum)
    // narrowing refuses — Spark's own V2 ALTER COLUMN check kills it
    // before the catalog; the engine's ADDITIVE/WIDENING guard
    // (Snapshots.evolveSchema) is the defense in depth behind it
    val e = intercept[Exception] {
      ext.sql("ALTER TABLE gcat.db.mse ALTER COLUMN v TYPE INT")
    }
    assert(e.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN") ||
      e.getMessage.contains("ADDITIVE/WIDENING"), e.getMessage)
    val e2 = intercept[Exception] {
      graft.operators.Snapshots.evolveSchema(ext, dir, Nil,
        Seq("v" -> org.apache.spark.sql.types.IntegerType))
    }
    assert(e2.getMessage.contains("ADDITIVE/WIDENING"), e2.getMessage)
  }

  test("MERGE with ONLY not-matched-by-source clauses keeps a " +
    "multi-matched target row exactly ONCE: without matched actions " +
    "the cardinality guard never runs, so the rewrite must mark " +
    "match-existence from a deduplicated position set, not a fan-out " +
    "join") {
    ext.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
    ext.sql("""CREATE TABLE gcat.db.mgnmbs (k BIGINT, v BIGINT,
      bucket BIGINT) USING graft TBLPROPERTIES(
        'maintain.bucket'='bucket', 'maintain.sort'='k')""")
    ext.sql("INSERT INTO gcat.db.mgnmbs SELECT id, id * 2, id % 2 " +
      "FROM range(0, 10)")
    // source matches k∈[0,5) — k=0 and k=1 TWICE (legal SQL:
    // duplicate source matches without UPDATE/DELETE matched actions)
    // — the NMBS delete touches every file while k=0/k=1 survive ONCE
    ext.sql("""MERGE INTO gcat.db.mgnmbs AS t
      USING (SELECT id % 5 AS k FROM range(0, 7)) AS s
      ON t.k = s.k
      WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    val got = ext.sql("SELECT k, v FROM gcat.db.mgnmbs ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === (0L to 4L).map(k => (k, k * 2)),
      "matched rows keep exactly once (no fan-out); NMBS deletes 5..9")
  }

  test("SQL UPDATE: a conditional SET rewrites ONLY the files holding " +
    "matches (stats-pruned candidate pass), unmatched rows in touched " +
    "files survive verbatim, time travel reads the pre-update state, a " +
    "no-match UPDATE commits nothing, and clustered layouts / subquery " +
    "conditions refuse with the story") {
    ext.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
    ext.sql("""CREATE TABLE gcat.db.up (k BIGINT, v BIGINT, bucket BIGINT)
      USING graft TBLPROPERTIES(
        'maintain.bucket'='bucket', 'maintain.sort'='k')""")
    ext.sql("INSERT INTO gcat.db.up SELECT id, id * 2, id % 4 " +
      "FROM range(0, 100)")
    val dir = s"$warehouse/db/up"
    val vPre = Snapshots.latest(ext, dir).get
    val filesPre = Snapshots.files(ext, dir, vPre)
    ext.sql("UPDATE gcat.db.up SET v = -k WHERE k % 10 = 3 AND bucket = 3")
    val v2 = Snapshots.latest(ext, dir).get
    assert(v2 === vPre + 1, "one statement, one commit")
    // only bucket 3's file(s) rewrote: every other file carries over
    val filesPost = Snapshots.files(ext, dir, v2)
    assert(filesPre.filterNot(_.contains("__bdir=3"))
      .forall(filesPost.contains),
      "untouched buckets share their files byte-for-byte")
    val got = ext.sql("SELECT k, v FROM gcat.db.up ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = (0L until 100L).map(k =>
      (k, if (k % 10 == 3 && k % 4 == 3) -k else k * 2))
    assert(got === want, "matched rows updated, everything else verbatim")
    assert(ext.sql(s"SELECT sum(v) FROM gcat.db.up VERSION AS OF $vPre")
      .head().getLong(0) === (0L until 100L).map(_ * 2).sum,
      "time travel across the update")
    // no matches: no commit
    ext.sql("UPDATE gcat.db.up SET v = 0 WHERE k = 123456")
    assert(Snapshots.latest(ext, dir).get === v2,
      "a no-match UPDATE must not burn a version")
    // clustered refusal (self-contained fixture — no cross-test table)
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    HashBucketedTable.publish(
      ext.range(0, 40).select(col("id").cast("string").as("key"),
        col("id").as("n")),
      s"$warehouse/db/uph", "key", 4)
    val e = intercept[Exception] {
      ext.sql("UPDATE gcat.db.uph SET n = 0 WHERE key = 'x'")
    }
    assert(msgs(e).exists(m => m.contains("hash-layout") &&
      m.contains("upsert")), e.toString)
    // subquery conditions refuse with the materialize hint
    val e2 = intercept[Exception] {
      ext.sql("UPDATE gcat.db.up SET v = 0 WHERE k IN " +
        "(SELECT k FROM gcat.db.up WHERE v < 0)")
    }
    assert(msgs(e2).exists(_.contains("materialize")), e2.toString)
  }

  test("SQL MERGE INTO, the upsert fast path: equality ON + " +
    "unconditional UPDATE SET * + INSERT * dispatches to the LAYOUT's " +
    "own merge — a z-order table keeps its epochs and cells, an " +
    "insert-only merge appends through the layout on any layout, and " +
    "the general shape refuses on clustered layouts with the story") {
    val zdir = s"$warehouse/db/mz"
    ZOrderTable.publish(
      ext.range(0, 4000, 1, 4).select(col("id"),
        (col("id") * 7919 % 65536).as("x"),
        (col("id") * 104729 % 65536).as("y"),
        (col("id") * 3).as("v")),
      zdir, Seq("x", "y"), shift = 26)
    // upsert: dims must ride in the ON keys for the z merge contract
    ext.sql("""MERGE INTO gcat.db.mz AS t
      USING (SELECT id, (id * 7919) % 65536 AS x,
               (id * 104729) % 65536 AS y, -1L AS v
             FROM range(3900, 4100)) AS s
      ON t.id = s.id AND t.x = s.x AND t.y = s.y
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(ext.sql("SELECT count(*) FROM gcat.db.mz").head().getLong(0)
      === 4100L)
    assert(ext.sql("SELECT sum(v) FROM gcat.db.mz WHERE id >= 3900")
      .head().getLong(0) === -200L, "matched updated, unmatched inserted")
    // the merge went through the LAYOUT: every live file carries a
    // z epoch (the generic copy-on-write would have dropped them)
    val vz = Snapshots.latest(ext, zdir).get
    val shifts = ZOrderTable.fileShifts(ext, zdir, vz)
    assert(Snapshots.files(ext, zdir, vz).forall(shifts.contains),
      "the SQL upsert dispatched to ZOrderTable.merge (epoch lines)")
    // box pruning still exact after the SQL merge
    assert(ext.sql(
      "SELECT count(*) FROM gcat.db.mz WHERE x < 16384 AND y < 16384")
      .head().getLong(0) ===
      (0L until 4100L).count(i =>
        i * 7919 % 65536 < 16384 && i * 104729 % 65536 < 16384))
    // insert-only merge on the clustered layout: a layout append
    ext.sql("""MERGE INTO gcat.db.mz AS t
      USING (SELECT id, (id * 7919) % 65536 AS x,
               (id * 104729) % 65536 AS y, 7L AS v
             FROM range(4050, 4200)) AS s
      ON t.id = s.id
      WHEN NOT MATCHED THEN INSERT *""")
    assert(ext.sql("SELECT count(*) FROM gcat.db.mz").head().getLong(0)
      === 4200L)
    // the general shape on clustered refuses toward the upsert story
    val e = intercept[Exception] {
      ext.sql("""MERGE INTO gcat.db.mz AS t
        USING (SELECT 1L AS id, 1L AS x, 1L AS y, 1L AS v) AS s
        ON t.id = s.id
        WHEN MATCHED AND s.v > t.v THEN UPDATE SET *""")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("general-shape") &&
      m.contains("upsert")), e.toString)
  }
}
