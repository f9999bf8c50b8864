package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone check of the spark.sql.extensions deployment path
  * (fresh JVM => fresh session with GraftExtensions applied).
  * Run: sbt "runMain graft.tools.ExtCheck" */
object ExtCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val row = spark.sql(
      """SELECT st_area('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))') AS a,
        |  sorted_intersect_count(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS c,
        |  zorder_key(3L, 5L) AS zk,
        |  vec_l2sq(array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)),
        |           array(CAST(3.0 AS DOUBLE), CAST(0.0 AS DOUBLE))) AS l2,
        |  unicode_normalize('Café', 'NFD') AS nf
        |""".stripMargin).collect()(0)
    assert(row.getAs[Double]("a") == 4.0 && row.getAs[Int]("c") == 2)
    assert(row.getAs[Long]("zk") == java.lang.Long.parseLong("100111", 2))
    assert(row.getAs[Double]("l2") == 8.0)
    assert(row.getAs[String]("nf").length == 5) // NFD decomposes é
    // the TABLE layer's SQL surface, through the same deployment conf:
    // graft_table (latest + time travel), graft_history, graft_changes
    import org.apache.spark.sql.functions._
    val dir = sys.props("java.io.tmpdir").stripSuffix("/") + "/graft_extcheck_tbl"
    graft.operators.Snapshots.dropPath(spark, dir)
    graft.operators.Snapshots.publish(
      spark.range(0, 100, 1, 2).select(col("id").as("k"),
        (col("id") * 3).as("v"), (col("id") % 4).as("bucket")),
      dir, "bucket", Seq("k"))
    graft.operators.Snapshots.merge(
      spark.range(0, 5).select(col("id").as("k"), lit(-1L).as("v"),
        (col("id") % 4).as("bucket")),
      dir, "bucket", Seq("k"), Seq("k"))
    val n1 = spark.sql(s"SELECT count(*) AS n FROM graft_table('$dir', 1)")
      .collect()(0).getLong(0)
    val neg = spark.sql(
      s"SELECT count(*) AS n FROM graft_table('$dir') WHERE v = -1")
      .collect()(0).getLong(0)
    val hist = spark.sql(
      s"SELECT count(*) FROM graft_history('$dir')").collect()(0).getLong(0)
    val chg = spark.sql(s"SELECT count(*) FROM graft_changes('$dir', 1, 2) " +
      "WHERE _change = 'insert'").collect()(0).getLong(0)
    assert(n1 == 100 && neg == 5 && hist == 2 && chg == 5,
      s"table SQL surface: n1=$n1 neg=$neg hist=$hist chg=$chg")
    // the NAMED-table surface through the same fresh-JVM conf path:
    // format("graft") by SHORT NAME (DataSourceRegister service file),
    // versionAsOf, the filesystem catalog (conf-configured), CREATE +
    // INSERT + SELECT + VERSION AS OF, and the ledger-backed sink
    val fmtN = spark.read.format("graft").load(dir).count()
    val fmtV1 = spark.read.format("graft").option("versionAsOf", "1")
      .load(dir).filter(col("v") >= 0).count()
    assert(fmtN == 100 && fmtV1 == 100,
      s"format(graft): head=$fmtN v1=$fmtV1")
    val wh = sys.props("java.io.tmpdir").stripSuffix("/") + "/graft_extcheck_wh"
    val whF = new java.io.File(wh)
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmrf)); f.delete(); ()
    }
    rmrf(whF)
    spark.conf.set("spark.sql.catalog.gx", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gx.warehouse", wh)
    spark.sql("CREATE NAMESPACE gx.db")
    spark.sql("""CREATE TABLE gx.db.t (k BIGINT, v BIGINT, bucket BIGINT)
      USING graft TBLPROPERTIES(
        'maintain.bucket'='bucket', 'maintain.sort'='k')""")
    spark.sql("INSERT INTO gx.db.t SELECT id, id * 2, id % 4 FROM range(0, 50)")
    spark.sql("INSERT INTO gx.db.t VALUES (900, 7, 0)")
    val catN = spark.sql("SELECT count(*) FROM gx.db.t").collect()(0).getLong(0)
    val catS = spark.sql("SELECT sum(v) FROM gx.db.t WHERE k < 900")
      .collect()(0).getLong(0)
    val catV2 = spark.sql("SELECT count(*) FROM gx.db.t VERSION AS OF 2")
      .collect()(0).getLong(0)
    // INSERT carried the TBLPROPERTIES (the staging path ran)
    val carried = graft.operators.Snapshots.propsAt(spark, s"$wh/db/t",
      graft.operators.Snapshots.latest(spark, s"$wh/db/t").get)
    assert(catN == 51 && catS == (0 until 50).map(_ * 2L).sum && catV2 == 50 &&
      carried.get("maintain.bucket").contains("bucket"),
      s"catalog: n=$catN sum=$catS v2=$catV2 props=$carried")
    // the maintenance SQL statements through the same conf path (the
    // injected parser): OPTIMIZE folds the two inserts' fragments,
    // DESCRIBE HISTORY reads the manifest frame with stamped times
    val opt = spark.sql("OPTIMIZE gx.db.t").collect()(0)
    val histRows = spark.sql("DESCRIBE HISTORY gx.db.t").collect()
    assert(opt.getString(0) == "flat" && opt.getBoolean(3) &&
      histRows.length == 4 && histRows.forall(_.getLong(1) > 0L),
      s"maintenance SQL: optimize=$opt history=${histRows.length}")
    println(s"[extcheck] OK: st_area=${row.getAs[Double]("a")} intersect=${row.getAs[Int]("c")}" +
      s" zorder=${row.getAs[Long]("zk")} l2=${row.getAs[Double]("l2")}" +
      s" graft_table=$n1/$neg history=$hist changes=$chg" +
      s" format=$fmtN/$fmtV1 catalog=$catN/$catS/$catV2" +
      s" maintsql=${opt.getString(0)}/${histRows.length}")
    spark.stop()
  }
}
