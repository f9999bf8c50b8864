package graft

import org.apache.spark.sql.functions._

import graft.functions.TableFunctions
import graft.operators.Snapshots

/** The table layer's SQL surface: graft_table (latest + time travel),
  * graft_changes, graft_history as TABLE-VALUED functions — same
  * logical plans as the Scala API (manifest-statistics relation,
  * DV-filtered), so SQL users get broadcast decisions and data
  * skipping for free. Late-bound into the shared session (the
  * withExtensions wiring itself is verified by tools.ExtCheck's
  * fresh-JVM run). */
class TableFunctionsSpec extends SparkSuite {

  import spark.implicits._

  TableFunctions.registerBuilders(spark)

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_tvf_$name")
    d.toFile.deleteOnExit()
    d.toString + "/tbl"
  }

  private def rows(lo: Long, hi: Long) =
    spark.range(lo, hi, 1, 4).select(col("id").as("k"),
      (col("id") * 31L).as("v"), (col("id") % 8).as("bucket"))

  test("graft_table: latest + time travel from pure SQL, equal to the " +
    "Scala reads; a SQL join of two snapshot tables BROADCASTS off the " +
    "manifest statistics; filters data-skip") {
    val fact = tmpDir("fact")
    val dim = tmpDir("dim")
    Snapshots.publish(
      spark.range(0, 50000, 1, 4).select(col("id").as("k"),
        (col("id") * 7).as("payload"), expr("id div 6250").as("bucket")),
      fact, "bucket", Seq("k"))
    Snapshots.publish(rows(0, 200), dim, "bucket", Seq("k"))
    Snapshots.merge(Seq((7L, -1L, 7L)).toDF("k", "v", "bucket"),
      dim, "bucket", Seq("k"), Seq("k"))
    // latest and time travel equal the Scala reads
    assert(spark.sql(s"SELECT sum(v) FROM graft_table('$dim')")
      .as[Long].head() ===
      Snapshots.read(spark, dim).agg(sum("v")).as[Long].head())
    assert(spark.sql(s"SELECT sum(v) FROM graft_table('$dim', 1)")
      .as[Long].head() ===
      Snapshots.readAt(spark, dim, 1L).agg(sum("v")).as[Long].head())
    // a plain SQL join between two TVFs broadcasts: the relation
    // reports its manifest size to Spark's own planner
    val joined = spark.sql(
      s"""SELECT f.k, f.payload, d.v
         |FROM graft_table('$fact') f JOIN graft_table('$dim') d
         |ON f.k = d.k""".stripMargin)
    assert(joined.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    assert(joined.count() === 200L)
    // pushed-down SQL filters data-skip whole files (8 key-ranged
    // buckets; the range hits 1)
    val skim = spark.sql(
      s"SELECT * FROM graft_table('$fact') WHERE k >= 6250 AND k < 12500")
    assert(skim.count() === 6250L)
    skim.collect()
    val scan = skim.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    assert(scan.metrics("numFiles").value === 1,
      s"SQL filter pruned to 1 of 8 files")
  }

  test("graft_changes and graft_history: CDC and DESCRIBE-HISTORY from " +
    "SQL — deletion-vector deltas included, manifest-only metrics") {
    val dir = tmpDir("hist")
    Snapshots.mergeBatch(0L, rows(0, 400), dir, "bucket", Seq("k"), Seq("k"))
    Snapshots.merge(Seq((3L, 999L, 3L)).toDF("k", "v", "bucket"),
      dir, "bucket", Seq("k"), Seq("k"))
    Snapshots.deleteVectored(Seq((100L, 4L), (101L, 5L)).toDF("k", "bucket"),
      dir, "bucket", Seq("k"))
    // changes across the merge: the bucket rewrite's carried rows
    // CANCEL (diff is exact-multiset) — net one replaced row
    val net = spark.sql(
      s"""SELECT _change, count(*) AS n FROM graft_changes('$dir', 1, 2)
         |GROUP BY _change ORDER BY _change""".stripMargin)
      .as[(String, Long)].collect().toSeq
    assert(net === Seq(("delete", 1L), ("insert", 1L)),
      "net row-level changes of one replaced key")
    // the DV step: two deletes, zero inserts, visible from SQL
    assert(spark.sql(
      s"SELECT k FROM graft_changes('$dir', 2, 3) WHERE _change = 'delete'")
      .as[Long].collect().sorted.toSeq === Seq(100L, 101L))
    // history: manifest-only metrics per version
    val h = spark.sql(
      s"""SELECT version, files, rows, bytes, dead_rows, batch
         |FROM graft_history('$dir') ORDER BY version""".stripMargin)
      .collect()
    assert(h.length === 3)
    assert(h(0).getLong(1) === 8L && h(0).getLong(2) === 400L &&
      h(0).getLong(4) === 0L && h(0).getLong(5) === 0L, s"${h(0)}")
    assert(h(1).getLong(2) === 400L, "merge keeps the count")
    assert(h(2).getLong(2) === 398L && h(2).getLong(4) === 2L,
      "the DV version subtracts its dead rows, manifest-only")
    assert(h(2).getLong(5) === 0L, "the carried batch header surfaces")
    assert(h.forall(_.getLong(3) > 0L), "byte sizes recorded")
    // argument discipline: non-literal args refuse (they select the
    // TABLE; there is no row context in a FROM clause)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_table(CAST(rand() AS STRING))").collect()
    }
    assert(e.getMessage.contains("literal") ||
      e.getMessage.toLowerCase.contains("fold"), e.getMessage)
    // foldable EXPRESSIONS are fine (they still select one table)
    assert(spark.sql(s"SELECT count(*) FROM graft_table(concat('$dir', ''))")
      .as[Long].head() === 398L)
  }
}
