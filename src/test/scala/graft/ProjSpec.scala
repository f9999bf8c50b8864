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

  test("UTM forward hits the published CN Tower control point") {
    // CN Tower, the UTM article's worked example: 43.642567 N,
    // 79.387139 W -> zone 17N easting 630084 m, northing 4833438 m
    // (published rounded to the meter)
    val p = pt(Proj.transform(GPoint(Pt(-79.387139, 43.642567)),
      "EPSG:4326", "EPSG:32617"))
    assert(math.abs(p.x - 630084) < 1.0, s"easting ${p.x}")
    assert(math.abs(p.y - 4833438) < 1.0, s"northing ${p.y}")
    // the zone helper picks the same zone
    assert(Proj.utmEpsg(-79.387139, 43.642567) == "EPSG:32617")
    assert(Proj.utmEpsg(151.2153, -33.8568) == "EPSG:32756") // Sydney
  }

  test("UTM structural identities: central meridian, equator, hemispheres") {
    // a point ON the central meridian at the equator maps to the
    // false origin exactly
    val o = pt(Proj.transform(GPoint(Pt(-81.0, 0.0)), "EPSG:4326", "EPSG:32617"))
    assert(math.abs(o.x - 500000.0) < 1e-6 && math.abs(o.y) < 1e-6)
    // mirrored latitudes: south northing = 10 000 000 - north northing
    val n = pt(Proj.transform(GPoint(Pt(-79.387139, 43.642567)),
      "EPSG:4326", "EPSG:32617"))
    val s = pt(Proj.transform(GPoint(Pt(-79.387139, -43.642567)),
      "EPSG:4326", "EPSG:32717"))
    assert(math.abs(s.x - n.x) < 1e-6)
    assert(math.abs(s.y - (10000000.0 - n.y)) < 1e-6)
  }

  test("UTM round trips are sub-centimeter across the zone; chains work") {
    for (lon <- Seq(-84.0, -81.0, -78.5); lat <- Seq(-70.0, -33.86, 0.5, 43.64, 83.0)) {
      val b = pt(Proj.transform(
        Proj.transform(GPoint(Pt(lon, lat)), "EPSG:4326",
          if (lat >= 0) "EPSG:32617" else "EPSG:32717"),
        if (lat >= 0) "EPSG:32617" else "EPSG:32717", "EPSG:4326"))
      // 1e-7 deg ~ 1 cm on the ground
      assert(math.abs(b.x - lon) < 1e-7 && math.abs(b.y - lat) < 1e-7,
        s"round trip drifted at ($lon, $lat) -> (${b.x}, ${b.y})")
    }
    // UTM <-> 3857 chains through lon/lat
    val viaMerc = pt(Proj.transform(GPoint(Pt(630084.0, 4833438.0)),
      "EPSG:32617", "EPSG:3857"))
    val direct = pt(Proj.transform(
      Proj.transform(GPoint(Pt(630084.0, 4833438.0)), "EPSG:32617", "EPSG:4326"),
      "EPSG:4326", "EPSG:3857"))
    assert(math.abs(viaMerc.x - direct.x) < 1e-9 && math.abs(viaMerc.y - direct.y) < 1e-9)
    assert(Proj.supports("EPSG:32617", "EPSG:3857") && Proj.supports("EPSG:32756", "EPSG:4326"))
  }

  test("UTM domain violations and malformed zone codes fail loudly") {
    // 15 degrees off the central meridian
    intercept[IllegalArgumentException] {
      Proj.transform(GPoint(Pt(-96.0, 40.0)), "EPSG:4326", "EPSG:32617")
    }
    // beyond the 84-degree UTM latitude limit
    intercept[IllegalArgumentException] {
      Proj.transform(GPoint(Pt(-81.0, 86.0)), "EPSG:4326", "EPSG:32617")
    }
    // zone 00 and zone 61 are not UTM zones
    assert(!Proj.supports("EPSG:4326", "EPSG:32600"))
    assert(!Proj.supports("EPSG:4326", "EPSG:32661"))
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
