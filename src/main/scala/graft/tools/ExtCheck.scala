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
    println(s"[extcheck] OK: st_area=${row.getAs[Double]("a")} intersect=${row.getAs[Int]("c")}" +
      s" zorder=${row.getAs[Long]("zk")} l2=${row.getAs[Double]("l2")}")
    spark.stop()
  }
}
