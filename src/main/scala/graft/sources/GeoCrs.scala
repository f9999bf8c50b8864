package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.MetadataBuilder

/** CRS tagging for geometry columns (reference main.py:140
  * `set_crs("EPSG:27700")` parity).
  *
  * The engine's cartogram math is CRS-agnostic (planar coordinates in
  * whatever unit the source used), but a geo user expects the frame to
  * REMEMBER its CRS — geopandas carries it on the GeoDataFrame and
  * set_crs/to_crs read it back. Spark's native slot for
  * column-attached facts is column METADATA: the tag rides the
  * geometry column's metadata through select/filter/join lineage, and
  * the GeoJSON source/sink and the Cartogram facade propagate it
  * explicitly where new geometry columns are built. [[toCrs]] adds
  * actual reprojection (beyond the reference, which only tags) for
  * the CRS pairs [[graft.geom.Proj]] supports.
  */
object GeoCrs {

  val MetaKey = "graft.crs"

  /** Tag `geomCol` with a CRS name (e.g. "EPSG:27700"). */
  def tag(df: DataFrame, crs: String, geomCol: String = "geometry"): DataFrame =
    df.withColumn(geomCol, col(geomCol).as(geomCol,
      new MetadataBuilder().putString(MetaKey, crs).build()))

  /** The CRS tag of `geomCol`, if any. */
  def of(df: DataFrame, geomCol: String = "geometry"): Option[String] =
    df.schema.fields.find(_.name == geomCol)
      .filter(_.metadata.contains(MetaKey))
      .map(_.metadata.getString(MetaKey))

  /** geopandas `to_crs` shape: REPROJECT the geometry column from its
    * tagged CRS to `crs`, and retag. Requires a tag (matching
    * geopandas, which raises on a CRS-less frame) and a transform
    * [[graft.geom.Proj]] supports; fails loudly otherwise — silently
    * passing mis-framed coordinates through would be worse than an
    * error. Goes beyond the reference (pycart only tags); the
    * transform itself is per-row kernel math, so it scales like every
    * other geometry projection. */
  def toCrs(df: DataFrame, crs: String, geomCol: String = "geometry"): DataFrame = {
    val from = of(df, geomCol).getOrElse(throw new IllegalArgumentException(
      s"cannot to_crs: column '$geomCol' carries no CRS tag (use GeoCrs.tag first)"))
    tag(df.withColumn(geomCol,
        graft.functions.GeoFunctions.st_transform(
          col(geomCol), org.apache.spark.sql.functions.lit(from),
          org.apache.spark.sql.functions.lit(crs))),
      crs, geomCol)
  }
}
