package graft

import graft.functions.GeoFunctions

/** The extension injection path: the SAME builder lambdas that
  * GraftExtensions injects (toScalaUDF bridge + native expression
  * constructors), exercised through the shared session's function
  * registry — a second SparkContext per JVM is impossible, so the
  * withExtensions wiring itself is verified by the standalone
  * `sbt "runMain"` path and covers only trivial plumbing on top. */
class ExtensionsSpec extends SparkSuite {

  test("injected builders resolve st_* and sorted_intersect_count in SQL") {
    GeoFunctions.registerBuilders(spark)
    val row = spark.sql(
      """SELECT st_area('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))') AS a,
        |  sorted_intersect_count(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS c
        |""".stripMargin).collect()(0)
    assert(row.getAs[Double]("a") === 4.0)
    assert(row.getAs[Int]("c") === 2)
  }
}
