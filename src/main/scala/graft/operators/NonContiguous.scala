package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions._

/** Non-contiguous cartogram (reference pycart/cartogram.py:172).
  *
  * Each region scales in place about its centroid by
  * `sqrt(density / anchor_density) * size_value`, where density =
  * value / area and the anchor is the max-density region.
  *
  * Spark-first: one narrow pass computes density, one scalar aggregate
  * finds the anchor (broadcast back as a literal-free cross join of a
  * 1-row frame — no collect in the plan), one narrow pass scales. No
  * shuffle of the data itself at any size; the reference's per-row
  * Python loop (cartogram.py:237) becomes a codegen'd map.
  */
object NonContiguous {

  /** @param df (idCol, valueCol, geomCol WKT)
    * @return id, value, scale, geometry (scaled WKT)
    */
  def run(df: DataFrame, idCol: String, valueCol: String, geomCol: String,
          sizeValue: Double = 1.0): DataFrame = {
    val withDensity = df.select(
        col(idCol).as("id"), col(valueCol).cast("double").as("value"),
        col(geomCol).as("geometry"))
      .withColumn("density", col("value") / st_area(col("geometry")))

    val anchor = withDensity.agg(max(col("density")).as("anchor_density"))

    withDensity.crossJoin(broadcast(anchor))
      .withColumn("scale", sqrt(col("density") / col("anchor_density")) * lit(sizeValue))
      .withColumn("geometry", st_scale_about_centroid(col("geometry"), col("scale")))
      .select(col("id"), col("value"), col("scale"), col("geometry"))
  }
}
