package graft

import org.apache.spark.sql.functions._

import graft.operators.Snapshots

/** Multi-table transactions: one create-exclusive record commits N
  * tables at once — a crashed transaction leaves EVERY member at its
  * old version, a concurrent plain writer force-aborts an undecided
  * transaction (liveness) and the loser fails cleanly, and vacuum
  * reclaims tombstoned claims. */
class TxnSpec extends SparkSuite {

  import spark.implicits._

  private def tmpBase(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_txn_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def fact = spark.range(0, 600, 1, 4)
    .select(
      pmod(col("id") * 811L + 13L, lit(600L)).as("key"),
      (col("id") * 31L).as("payload"))
    .withColumn("bucket", expr("key div 200"))

  private def dim = spark.range(0, 30, 1, 2)
    .select(col("id").as("key"), concat(lit("d"), col("id")).as("name"))
    .withColumn("bucket", expr("key div 10"))

  test("a CRASHED two-table transaction (record never written) leaves BOTH " +
    "tables readable at their old versions; the provisional manifests are " +
    "invisible tombstones readers refuse by name") {
    val base = tmpBase("crash")
    val (a, b) = (s"$base/fact", s"$base/dim")
    Snapshots.publish(fact, a, "bucket", Seq("key"))
    Snapshots.publish(dim, b, "bucket", Seq("key"))
    val txn = Snapshots.beginTxn(spark, s"$base/_txns/t1")
    val va = txn.append(fact.filter(col("key") < 5)
      .withColumn("payload", lit(-1L)), a, "bucket", Seq("key"))
    val vb = txn.merge(dim.filter(col("key") < 3)
      .withColumn("name", lit("MOD")), b, "bucket", Seq("key"), Seq("key"))
    assert(va === 2L && vb === 2L)
    // …and the coordinator dies here. Nothing is visible:
    assert(Snapshots.latest(spark, a) === Some(1L))
    assert(Snapshots.latest(spark, b) === Some(1L))
    assert(Snapshots.versions(spark, a) === Seq(1L))
    assert(Snapshots.read(spark, a).count() === 600L)
    assert(Snapshots.read(spark, b).filter(col("name") === "MOD").count() === 0L)
    val e = intercept[IllegalArgumentException](Snapshots.readAt(spark, a, 2L))
    assert(e.getMessage.contains("not committed"))
  }

  test("commit is ONE atomic point: both tables flip together, claims sit " +
    "ABOVE any tombstones, and a second commit is idempotent") {
    val base = tmpBase("commit")
    val (a, b) = (s"$base/fact", s"$base/dim")
    Snapshots.publish(fact, a, "bucket", Seq("key"))
    Snapshots.publish(dim, b, "bucket", Seq("key"))
    // a dead transaction first — its claims become tombstones
    val dead = Snapshots.beginTxn(spark, s"$base/_txns/dead")
    dead.append(fact.limit(1), a, "bucket", Seq("key"))
    // the live transaction claims above the tombstone
    val txn = Snapshots.beginTxn(spark, s"$base/_txns/live")
    val va = txn.append(fact.filter(col("key") < 5)
      .withColumn("payload", lit(-1L)), a, "bucket", Seq("key"))
    val vb = txn.merge(dim.filter(col("key") < 3)
      .withColumn("name", lit("MOD")), b, "bucket", Seq("key"), Seq("key"))
    assert(va === 3L, "claimed above the dead txn's tombstone at v2")
    assert(vb === 2L)
    assert(Snapshots.latest(spark, a) === Some(1L), "invisible until commit")
    txn.commit()
    assert(Snapshots.latest(spark, a) === Some(3L))
    assert(Snapshots.latest(spark, b) === Some(2L))
    assert(Snapshots.versions(spark, a) === Seq(1L, 3L), "tombstone skipped")
    assert(Snapshots.read(spark, a).count() === 605L)
    assert(Snapshots.read(spark, b).filter(col("name") === "MOD").count() === 3L)
    txn.commit() // idempotent
    // time travel still works under the committed txn versions
    assert(Snapshots.readAt(spark, a, 1L).count() === 600L)
    // the dead txn can no longer commit: its top was force-aborted by
    // the live txn's claim
    val e = intercept[IllegalStateException](dead.commit())
    assert(e.getMessage.contains("aborted"))
  }

  test("a concurrent PLAIN writer force-aborts an undecided transaction " +
    "(liveness: a crashed txn never write-locks its tables) and the " +
    "transaction then fails ATOMICALLY — its other member stays old too") {
    val base = tmpBase("race")
    val (a, b) = (s"$base/fact", s"$base/dim")
    Snapshots.publish(fact, a, "bucket", Seq("key"))
    Snapshots.publish(dim, b, "bucket", Seq("key"))
    val txn = Snapshots.beginTxn(spark, s"$base/_txns/racer")
    txn.append(fact.filter(col("key") < 5).withColumn("payload", lit(-1L)),
      a, "bucket", Seq("key"))
    txn.merge(dim.filter(col("key") < 3).withColumn("name", lit("MOD")),
      b, "bucket", Seq("key"), Seq("key"))
    // plain writer arrives at table a: resolves the undecided txn by
    // force-abort, claims above it, and its OWN write lands fine
    val vPlain = Snapshots.append(fact.filter(col("key") === 0L)
      .withColumn("payload", lit(9999L)), a, "bucket", Seq("key"))
    assert(vPlain === 3L)
    assert(Snapshots.latest(spark, a) === Some(3L))
    assert(Snapshots.read(spark, a).filter(col("payload") === 9999L).count() === 1L)
    // the transaction's commit now fails — and table b did NOT move
    val e = intercept[IllegalStateException](txn.commit())
    assert(e.getMessage.contains("aborted"))
    assert(Snapshots.latest(spark, b) === Some(1L),
      "cross-table atomicity of the abort")
    assert(Snapshots.read(spark, a).filter(col("payload") === -1L).count() === 0L,
      "the aborted txn's rows never surface")
  }

  test("vacuum reclaims a tombstoned claim's staged files once keepFrom " +
    "passes it; explicit abort() works and a committed txn refuses abort") {
    val base = tmpBase("reclaim")
    val a = s"$base/fact"
    Snapshots.publish(fact, a, "bucket", Seq("key"))
    val txn = Snapshots.beginTxn(spark, s"$base/_txns/tx")
    txn.append(fact.filter(col("key") < 5), a, "bucket", Seq("key"))
    txn.abort()
    val v3 = Snapshots.append(fact.filter(col("key") === 7L)
      .withColumn("payload", lit(1L)), a, "bucket", Seq("key"))
    assert(v3 === 3L)
    // keepFrom passes the tombstone: its manifest drops, its staged
    // file unreferences, the sweep reclaims it
    val (dropped, deleted, kept) = Snapshots.vacuum(spark, a, v3, retainMs = 0L)
    assert(dropped === 2L, "v1 and the tombstone v2")
    assert(deleted >= 1L, "the aborted claim's staged file reclaimed")
    assert(kept === Snapshots.files(spark, a, v3).size.toLong)
    assert(Snapshots.read(spark, a).count() === 601L)
    // record reuse and late aborts refuse
    intercept[IllegalArgumentException](
      Snapshots.beginTxn(spark, s"$base/_txns/tx"))
    val txn2 = Snapshots.beginTxn(spark, s"$base/_txns/tx2")
    txn2.append(fact.limit(1), a, "bucket", Seq("key"))
    txn2.commit()
    intercept[IllegalStateException](txn2.abort())
  }
}
