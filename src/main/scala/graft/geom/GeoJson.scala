package graft.geom

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Minimal GeoJSON geometry/feature codec built on Jackson (already on
  * the Spark classpath). Parses the subset the reference consumes
  * (reference main.py:15 parse_geojson): FeatureCollection of
  * Point / Polygon / MultiPolygon features with flat properties.
  */
object GeoJson {

  private val mapper = new ObjectMapper()

  def parseGeometry(json: String): Geom = geomOf(mapper.readTree(json))

  def geomOf(node: JsonNode): Geom = {
    val coords = node.get("coordinates")
    node.get("type").asText() match {
      case "Point" => GPoint(Pt(coords.get(0).asDouble(), coords.get(1).asDouble()))
      case "Polygon" => GPolygon(polyOf(coords))
      case "MultiPolygon" =>
        GMultiPolygon(coords.elements().asScala.map(polyOf).toVector)
      case other => sys.error(s"unsupported GeoJSON geometry: $other")
    }
  }

  private def polyOf(rings: JsonNode): Poly = {
    val rs = rings.elements().asScala.map { ring =>
      Ring(ring.elements().asScala.map(pt =>
        Pt(pt.get(0).asDouble(), pt.get(1).asDouble())).toVector)
    }.toVector
    Poly(rs.head, rs.tail)
  }

  /** One parsed feature: id (if any), flat string properties, geometry. */
  final case class Feature(id: Option[String], properties: Map[String, String], geom: Geom)

  def parseFeature(json: String): Feature = {
    val node = mapper.readTree(json)
    featureOf(node)
  }

  def featureOf(node: JsonNode): Feature = {
    val id = Option(node.get("id")).map(_.asText())
    val props = Option(node.get("properties")).map { p =>
      p.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    }.getOrElse(Map.empty)
    Feature(id, props, geomOf(node.get("geometry")))
  }

  /** Parse a whole FeatureCollection (driver-side convenience; the
    * distributed path is sources.GeoJsonSource). */
  def parseCollection(json: String): Seq[Feature] = {
    val node = mapper.readTree(json)
    node.get("features").elements().asScala.map(featureOf).toSeq
  }

  /** The collection-level CRS name, when the document carries the
    * legacy GeoJSON `crs` member (RFC 7946 dropped it, but real-world
    * files — and the reference's EPSG:27700 workflow, main.py:140 —
    * still use named CRS tags). */
  def collectionCrs(json: String): Option[String] = {
    val node = mapper.readTree(json)
    Option(node.get("crs"))
      .flatMap(c => Option(c.get("properties")))
      .flatMap(p => Option(p.get("name")))
      .map(_.asText())
  }

  // ---- serialization (round-trip back out of the engine) ----

  def geometryJson(g: Geom): String = g match {
    case GPoint(p) => s"""{"type":"Point","coordinates":[${p.x},${p.y}]}"""
    case GPolygon(poly) =>
      s"""{"type":"Polygon","coordinates":${polyCoords(poly)}}"""
    case GMultiPolygon(polys) =>
      s"""{"type":"MultiPolygon","coordinates":${polys.map(polyCoords).mkString("[", ",", "]")}}"""
  }

  private def polyCoords(p: Poly): String =
    (Iterator(p.shell) ++ p.holes.iterator)
      .map(r => r.pts.map(pt => s"[${pt.x},${pt.y}]").mkString("[", ",", "]"))
      .mkString("[", ",", "]")

  /** One GeoJSON Feature line (newline-delimited output format). */
  def featureJson(id: Option[String], properties: Map[String, String], g: Geom): String = {
    val props = properties.toSeq.sortBy(_._1).map { case (k, v) =>
      mapper.writeValueAsString(k) + ":" + mapper.writeValueAsString(v)
    }.mkString("{", ",", "}")
    val idPart = id.map(i => s""""id":${mapper.writeValueAsString(i)},""").getOrElse("")
    s"""{"type":"Feature",$idPart"properties":$props,"geometry":${geometryJson(g)}}"""
  }
}
