package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.geom.{GeoJson, Wkt}

/** Distributed GeoJSON readers (reference main.py:15 parse_geojson +
  * geopandas.GeoDataFrame.from_features).
  *
  * Two paths:
  *  - `readFeatureCollection`: a classic single-document
  *    FeatureCollection file. JSON documents aren't splittable, so each
  *    FILE is one task (read wholetext, explode features) — fine for
  *    the reference's use case (one country file), and many files
  *    still parallelize per-file.
  *  - `readFeatureLines`: newline-delimited GeoJSON (one Feature per
  *    line) — the 100 TB path: line-splittable, so a single huge file
  *    fans out across executors.
  *
  * Output schema either way: id (nullable), properties map, geometry
  * (WKT) — properties stay a map because GeoJSON schemas are dynamic.
  */
/** Row shape for GeoJSON features (public + top-level so Spark's
  * codegen'd serializers can reach the accessors). */
case class FeatRow(id: String, properties: Map[String, String], geometry: String)

object GeoJsonSource {

  def readFeatureCollection(spark: SparkSession, path: String): DataFrame = {
    val text = spark.read.option("wholetext", "true").text(path)
    val enc = Encoders.product[FeatRow]
    val df = text.select(col("value")).as(Encoders.STRING)
      .flatMap(doc => GeoJson.parseCollection(doc).map(f =>
        FeatRow(f.id.orNull, f.properties, Wkt.write(f.geom))))(enc)
      .toDF()
    // legacy collection-level crs member -> column metadata tag
    val crs = text.select(col("value")).as(Encoders.STRING)
      .flatMap(doc => GeoJson.collectionCrs(doc).toSeq)(Encoders.STRING)
      .take(1).headOption
    crs.fold(df)(c => GeoCrs.tag(df, c))
  }

  /** The non-Feature metadata line carrying the CRS tag through the
    * newline-delimited format (which has no document envelope). */
  private def crsLine(crs: String): String =
    s"""{"type":"graft:CrsTag","crs":${new com.fasterxml.jackson.databind.ObjectMapper().writeValueAsString(crs)}}"""

  /** Write (id, properties, geometry WKT) back out as newline-
    * delimited GeoJSON features — the splittable round-trip format
    * (each partition writes its own file; no driver collect). A CRS
    * tag on the geometry column (GeoCrs) is carried as one extra
    * metadata line the reader recognizes. */
  def writeFeatureLines(df: DataFrame, path: String): Unit = {
    val line = udf((id: String, props: Map[String, String], wkt: String) =>
      GeoJson.featureJson(Option(id), Option(props).getOrElse(Map.empty), Wkt.read(wkt)))
    val lines = df.select(line(col("id"), col("properties"), col("geometry")).as("value"))
    val out = GeoCrs.of(df) match {
      case Some(c) =>
        import df.sparkSession.implicits._
        lines.unionAll(Seq(crsLine(c)).toDF("value"))
      case None => lines
    }
    out.write.mode("overwrite").text(path)
  }

  def readFeatureLines(spark: SparkSession, path: String): DataFrame = {
    val enc = Encoders.product[FeatRow]
    val text = spark.read.text(path)
    val df = text.select(col("value")).as(Encoders.STRING)
      .filter(line => line.trim.nonEmpty && line.contains("\"Feature\""))
      .map { line =>
        val f = GeoJson.parseFeature(line.trim.stripSuffix(","))
        FeatRow(f.id.orNull, f.properties, Wkt.write(f.geom))
      }(enc)
      .toDF()
    // The substring scan is only a cheap prefilter: a Feature whose
    // property VALUE contains "graft:CrsTag" also matches, and taking
    // the first raw match would parse that feature (no crs member)
    // and silently drop the genuine tag. Parse every candidate (tag
    // lines are written once per dataset, so candidates are a
    // handful) and keep the first whose parsed type IS the tag.
    val crs = text.filter(col("value").contains("graft:CrsTag"))
      .select(col("value")).as(Encoders.STRING)
      .take(100)
      .iterator
      .flatMap { line =>
        scala.util.Try {
          val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
          if (node.hasNonNull("type") && node.get("type").asText() == "graft:CrsTag")
            Option(node.get("crs")).map(_.asText())
          else None
        }.toOption.flatten
      }
      .nextOption()
    crs.fold(df)(c => GeoCrs.tag(df, c))
  }
}
