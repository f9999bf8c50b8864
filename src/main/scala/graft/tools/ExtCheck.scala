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
        |  sorted_intersect_count(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS c
        |""".stripMargin).collect()(0)
    assert(row.getAs[Double]("a") == 4.0 && row.getAs[Int]("c") == 2)
    println(s"[extcheck] OK: st_area=${row.getAs[Double]("a")} intersect=${row.getAs[Int]("c")}")
    spark.stop()
  }
}
