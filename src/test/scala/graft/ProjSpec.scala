package graft

import org.apache.spark.sql.functions._
import graft.geom._
import graft.sources.GeoCrs

class ProjSpec extends SparkSuite {
  import spark.implicits._

  private def pt(g: Geom): Pt = g.asInstanceOf[GPoint].p

  test("4326 -> 3857 hits the published reference values") {
    // x(180 deg) = pi * R — the Web Mercator world half-width
    val p = pt(Proj.transform(GPoint(Pt(180, 0)), "EPSG:4326", "EPSG:3857"))
    assert(math.abs(p.x - 20037508.342789244) < 1e-6)
    assert(math.abs(p.y) < 1e-6) // tan(pi/4) rounds to 1 - 1ulp; sub-micron y
    // the square world: y(MaxLat) == x(180)
    val q = pt(Proj.transform(GPoint(Pt(0, Proj.MaxLat)), "EPSG:4326", "EPSG:3857"))
    assert(math.abs(q.y - 20037508.342789244) < 1e-6)
    // an off-axis point against independently computed values
    // (R*lon*pi/180, R*ln(tan(pi/4 + lat*pi/360)) at lon=1, lat=51)
    val r = pt(Proj.transform(GPoint(Pt(1.0, 51.0)), "EPSG:4326", "EPSG:3857"))
    assert(math.abs(r.x - 111319.49079327358) < 1e-6)
    assert(math.abs(r.y - 6621293.722740165) < 1e-6)
  }

  test("round trip is exact to float precision; same-CRS is identity") {
    val ring = Ring(Vector(Pt(-3.6, 50.4), Pt(-3.5, 50.4), Pt(-3.5, 50.5),
      Pt(-3.6, 50.5), Pt(-3.6, 50.4)))
    val g = GPolygon(Poly(ring))
    val back = Proj.transform(
      Proj.transform(g, "EPSG:4326", "EPSG:3857"), "EPSG:3857", "EPSG:4326")
    back.asInstanceOf[GPolygon].poly.shell.pts.zip(ring.pts).foreach {
      case (a, b) =>
        assert(math.abs(a.x - b.x) < 1e-9 && math.abs(a.y - b.y) < 1e-9)
    }
    assert(Proj.transform(g, "epsg:4326", "EPSG:4326") eq g) // identity, case-insensitive
  }

  test("out-of-domain latitude and unknown pairs fail loudly") {
    intercept[IllegalArgumentException] {
      Proj.transform(GPoint(Pt(0, 90)), "EPSG:4326", "EPSG:3857")
    }
    intercept[IllegalArgumentException] {
      Proj.transform(GPoint(Pt(0, 0)), "EPSG:4326", "EPSG:27700")
    }
    assert(Proj.supports("EPSG:3857", "EPSG:4326"))
    assert(!Proj.supports("EPSG:4326", "EPSG:27700"))
  }

  test("GeoCrs.toCrs reprojects the column and retags; untagged frames refuse") {
    val df = Seq(("a", "POINT (1 51)")).toDF("id", "geometry")
    val tagged = GeoCrs.tag(df, "EPSG:4326")
    val out = GeoCrs.toCrs(tagged, "EPSG:3857")
    assert(GeoCrs.of(out) === Some("EPSG:3857"))
    val got = pt(Wkt.read(out.select("geometry").as[String].head()))
    assert(math.abs(got.x - 111319.49079327358) < 1e-6)
    assert(math.abs(got.y - 6621293.722740165) < 1e-6)
    intercept[IllegalArgumentException] { GeoCrs.toCrs(df, "EPSG:3857") }
    // round trip through the column API returns to the original
    val back = GeoCrs.toCrs(out, "EPSG:4326")
    val p2 = pt(Wkt.read(back.select("geometry").as[String].head()))
    assert(math.abs(p2.x - 1.0) < 1e-9 && math.abs(p2.y - 51.0) < 1e-9)
  }
}
