package graft

import org.apache.spark.sql.functions._
import graft.geom._
import graft.operators.{Borders, NonContiguous}

/** MultiPolygon coverage: real country datasets (the reference's
  * World/UK GeoJSON) are littered with island chains — every operator
  * must treat a MultiPolygon region as one unit. */
class MultiPolygonSpec extends SparkSuite {

  // mainland square + two-island chain to its right; the first island
  // shares an edge with the mainland
  val mainland = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
  val islands = "MULTIPOLYGON (((4 1, 6 1, 6 3, 4 3, 4 1)), ((8 0, 10 0, 10 2, 8 2, 8 0)))"
  val faraway = "POLYGON ((20 20, 22 20, 22 22, 20 22, 20 20))"

  lazy val regions = {
    import spark.implicits._
    Seq(("main", mainland, 100.0), ("isles", islands, 50.0),
      ("far", faraway, 10.0)).toDF("id", "geometry", "value")
  }

  test("kernel: multipolygon area/perimeter/centroid aggregate over parts") {
    val g = Wkt.read(islands)
    assert(Ops.area(g) === 2.0 * 2 + 2.0 * 2)       // 4 + 4
    assert(Ops.perimeter(g) === 8.0 + 8.0)
    val c = Ops.centroid(g)
    assert(c.x === (4.0 * 5 + 4.0 * 9) / 8.0)       // area-weighted
    assert(c.y === (4.0 * 2 + 4.0 * 1) / 8.0)
  }

  test("Borders: island chain borders the mainland through its first part") {
    val b = Borders.compute(regions, "id", "geometry").collect()
    val pairs = b.map(r => (r.getAs[String]("focal_id"), r.getAs[String]("neighbor_id")) ->
      r.getAs[Double]("weight")).toMap
    assert(pairs.keySet === Set(("main", "isles"), ("isles", "main")))
    assert(pairs(("main", "isles")) === 2.0)         // shared edge x=4, y in [1,3]
  }

  test("NonContiguous scales a multipolygon about its combined centroid") {
    val out = NonContiguous.run(regions, "id", "value", "geometry").collect()
      .map(r => r.getAs[String]("id") -> r).toMap
    val g0 = Wkt.read(islands)
    val g1 = Wkt.read(out("isles").getAs[String]("geometry"))
    val f = out("isles").getAs[Double]("scale")
    assert(math.abs(Ops.area(g1) - f * f * Ops.area(g0)) < 1e-9)
    val c0 = Ops.centroid(g0); val c1 = Ops.centroid(g1)
    assert(math.abs(c0.x - c1.x) < 1e-9 && math.abs(c0.y - c1.y) < 1e-9)
    // both parts survive as a MultiPolygon
    assert(g1.isInstanceOf[GMultiPolygon])
  }
}
