package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geom._

/** Property-based invariants for the geometry kernel over seeded
  * random star-shaped polygons (angles sorted => simple polygons).
  * Hand-rolled generator: deterministic under seed, no extra deps.
  */
class GeomPropertySpec extends AnyFunSuite {

  val rng = new scala.util.Random(42)
  val N = 200

  /** Convex hull of random points (monotone chain): guaranteed simple.
    * (A sorted-angle "star" is NOT always simple — extreme radius
    * ratios let chords cross the center into other wedges.) */
  def randPoly(): GPolygon = {
    val cx = rng.nextDouble() * 2000 - 1000
    val cy = rng.nextDouble() * 2000 - 1000
    val cloud = Vector.fill(6 + rng.nextInt(12))(
      Pt(cx + rng.nextDouble() * 100 - 50, cy + rng.nextDouble() * 100 - 50))
    val sortedPts = cloud.distinct.sortBy(p => (p.x, p.y))
    def cross(o: Pt, a: Pt, b: Pt) =
      (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x)
    def chain(ps: Seq[Pt]): Vector[Pt] =
      ps.foldLeft(Vector.empty[Pt]) { (acc, p) =>
        var h = acc
        while (h.length >= 2 && cross(h(h.length - 2), h(h.length - 1), p) <= 0)
          h = h.dropRight(1)
        h :+ p
      }
    val hull = chain(sortedPts).dropRight(1) ++ chain(sortedPts.reverse).dropRight(1)
    val pts = if (hull.length >= 3) hull
      else Vector(Pt(cx, cy), Pt(cx + 1, cy), Pt(cx, cy + 1))
    GPolygon(Poly(Ring(pts :+ pts.head)))
  }

  lazy val polys: Seq[GPolygon] = Seq.fill(N)(randPoly())

  test("area is translation-invariant") {
    polys.foreach { g =>
      val dx = rng.nextDouble() * 200 - 100; val dy = rng.nextDouble() * 200 - 100
      val a0 = Ops.area(g)
      val a1 = Ops.area(Ops.translate(g, dx, dy))
      assert(math.abs(a0 - a1) <= 1e-6 * math.max(1.0, a0))
    }
  }

  test("scaling by f multiplies area by f^2 and fixes the origin point") {
    polys.foreach { g =>
      val f = 0.1 + rng.nextDouble() * 3
      val c = Ops.centroid(g)
      val s = Ops.scale(g, f, f, c)
      assert(math.abs(Ops.area(s) - f * f * Ops.area(g)) <= 1e-6 * math.max(1.0, Ops.area(g)))
      val cs = Ops.centroid(s)
      assert(math.abs(cs.x - c.x) <= 1e-6 && math.abs(cs.y - c.y) <= 1e-6)
    }
  }

  test("WKT and GeoJSON round trips are exact") {
    polys.foreach { g =>
      assert(Wkt.read(Wkt.write(g)) === g)
      assert(GeoJson.parseGeometry(GeoJson.geometryJson(g)) === g)
    }
  }

  test("perimeter positive; centroid inside bbox") {
    polys.foreach { g =>
      assert(Ops.perimeter(g) > 0)
      val (minx, miny, maxx, maxy) = Ops.bbox(g)
      val c = Ops.centroid(g)
      assert(c.x >= minx - 1e-9 && c.x <= maxx + 1e-9)
      assert(c.y >= miny - 1e-9 && c.y <= maxy + 1e-9)
    }
  }

  test("distance and sharedBorderLength are symmetric; distance >= 0") {
    polys.sliding(2).foreach {
      case Seq(a, b) =>
        val d1 = Ops.distance(a, b); val d2 = Ops.distance(b, a)
        assert(math.abs(d1 - d2) <= 1e-9 && d1 >= 0.0)
        assert(math.abs(Ops.sharedBorderLength(a, b) - Ops.sharedBorderLength(b, a)) <= 1e-9)
      case _ =>
    }
  }

  test("buffered circles: area within 0.2% of pi*r^2 at quadsegs=16") {
    (1 to 50).foreach { _ =>
      val r = 0.1 + rng.nextDouble() * 100
      val c = Pt(rng.nextDouble() * 100, rng.nextDouble() * 100)
      val g = Ops.bufferPoint(c, r, 16)
      assert(math.abs(Ops.area(g) - math.Pi * r * r) / (math.Pi * r * r) < 0.002)
      val cc = Ops.centroid(g)
      assert(math.abs(cc.x - c.x) < 1e-6 * math.max(1, r) &&
             math.abs(cc.y - c.y) < 1e-6 * math.max(1, r))
    }
  }
}
