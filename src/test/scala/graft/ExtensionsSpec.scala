package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** spark.sql.extensions entry point: a FRESH session built with
  * GraftExtensions must expose every graft SQL function with no
  * register() call. Uses newSession()-style isolation via a dedicated
  * builder (the shared TestSpark session must not leak functions in). */
class ExtensionsSpec extends AnyFunSuite {

  test("st_* and sorted_intersect_count resolve via withExtensions") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val row = spark.sql(
        """SELECT st_area('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))') AS a,
          |  sorted_intersect_count(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS c
          |""".stripMargin).collect()(0)
      assert(row.getAs[Double]("a") === 4.0)
      assert(row.getAs[Int]("c") === 2)
    } finally spark.stop()
  }
}
