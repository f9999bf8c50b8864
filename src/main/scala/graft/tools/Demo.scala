package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Borders, Dorling, NonContiguous}
import graft.sources.GeoJsonSource

/** End-to-end demo of the cartogram pipeline on the reference's test
  * fixture (the pycart quickstart, Spark-native):
  * GeoJSON -> attribute join -> borders -> non-contiguous + Dorling.
  *
  * Run: sbt "runMain graft.tools.Demo"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Load the reference fixture: 4 rectangles + populations
    // (reference data/Test/square_test.geojson + squares_pop.csv).
    val geo = GeoJsonSource.readFeatureCollection(
      spark, "/root/reference/data/Test/square_test.geojson")
    val pop = spark.read.option("header", "true")
      .csv("/root/reference/data/Test/squares_pop.csv")
      .select(col("name"), col("Population").cast("double").as("population"))

    val squares = geo
      .select(col("properties")("name").as("name"), col("geometry"))
      .join(pop, "name")

    println("=== input ===")
    squares.orderBy("name").show(truncate = false)

    println("=== Queen borders (focal, neighbor, shared-border weight) ===")
    Borders.compute(squares, "name", "geometry")
      .orderBy("focal_id", "neighbor_id").show(20, truncate = false)

    println("=== non-contiguous cartogram ===")
    NonContiguous.run(squares, "name", "population", "geometry")
      .select("id", "value", "scale").orderBy("id").show(truncate = false)

    println("=== Dorling cartogram (20 iterations) ===")
    Dorling.run(squares, "name", "population", "geometry", iterations = 20)
      .select("id", "value", "radius", "x", "y").orderBy("id")
      .show(truncate = false)

    spark.stop()
  }
}
