package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom._

class ClipSpec extends AnyFunSuite {

  def rect(ax: Double, ay: Double, bx: Double, by: Double): GPolygon =
    GPolygon(Poly(Ring(Vector(Pt(ax, ay), Pt(bx, ay), Pt(bx, by), Pt(ax, by), Pt(ax, ay)))))

  test("overlapping rectangles: intersection area is the overlap box") {
    val a = rect(0, 0, 4, 4); val b = rect(2, 1, 6, 3)
    assert(math.abs(Ops.convexIntersectionArea(a, b) - 2.0 * 2.0) < 1e-12)
    // symmetric for convex-convex
    assert(math.abs(Ops.convexIntersectionArea(b, a) - 4.0) < 1e-12)
  }

  test("disjoint and touching rectangles give zero area") {
    assert(Ops.convexIntersectionArea(rect(0, 0, 1, 1), rect(5, 5, 6, 6)) === 0.0)
    assert(Ops.convexIntersectionArea(rect(0, 0, 1, 1), rect(1, 0, 2, 1)) === 0.0)
  }

  test("containment returns the inner area") {
    assert(math.abs(Ops.convexIntersectionArea(rect(1, 1, 2, 2), rect(0, 0, 4, 4)) - 1.0) < 1e-12)
    assert(math.abs(Ops.convexIntersectionArea(rect(0, 0, 4, 4), rect(1, 1, 2, 2)) - 1.0) < 1e-12)
  }

  test("non-convex subject clips correctly against a convex window") {
    // L-shape: 3x3 square minus its top-right 2x2 => area 5
    val L = GPolygon(Poly(Ring(Vector(
      Pt(0, 0), Pt(3, 0), Pt(3, 1), Pt(1, 1), Pt(1, 3), Pt(0, 3), Pt(0, 0)))))
    assert(math.abs(Ops.area(L) - 5.0) < 1e-12)
    // clip with a window covering the lower half (y<=1): L∩window = 3x1
    assert(math.abs(Ops.convexIntersectionArea(L, rect(0, 0, 3, 1)) - 3.0) < 1e-12)
    // window over the left column (x<=1): area 3
    assert(math.abs(Ops.convexIntersectionArea(L, rect(0, 0, 1, 3)) - 3.0) < 1e-12)
  }

  test("clockwise clip ring is normalized") {
    val cw = GPolygon(Poly(Ring(Vector(Pt(2, 1), Pt(2, 3), Pt(6, 3), Pt(6, 1), Pt(2, 1)))))
    assert(math.abs(Ops.convexIntersectionArea(rect(0, 0, 4, 4), cw) - 4.0) < 1e-12)
  }

  test("multipolygon subjects accumulate per part") {
    val mp = GMultiPolygon(Vector(
      rect(0, 0, 1, 1).poly, rect(2, 0, 3, 1).poly))
    assert(math.abs(Ops.convexIntersectionArea(mp, rect(0, 0, 4, 4)) - 2.0) < 1e-12)
  }

  // ---- general (concave x concave) intersection area ----

  /** L-shape: the 3x3 square minus its top-right 2x2 corner, area 5. */
  def ell(ox: Double, oy: Double): GPolygon = GPolygon(Poly(Ring(Vector(
    Pt(ox, oy), Pt(ox + 3, oy), Pt(ox + 3, oy + 1), Pt(ox + 1, oy + 1),
    Pt(ox + 1, oy + 3), Pt(ox, oy + 3), Pt(ox, oy)))))

  test("concave x convex matches the convex clipper") {
    for (w <- Seq(rect(0, 0, 3, 1), rect(0, 0, 1, 3), rect(0, 0, 4, 4), rect(2, 2, 5, 5))) {
      val viaConvex = Ops.convexIntersectionArea(ell(0, 0), w)
      val viaGeneral = Ops.intersectionArea(ell(0, 0), w)
      assert(math.abs(viaConvex - viaGeneral) < 1e-9, s"window $w")
      // and symmetric
      assert(math.abs(Ops.intersectionArea(w, ell(0, 0)) - viaGeneral) < 1e-9)
    }
  }

  test("concave x concave: two interlocking L-shapes, hand-computed") {
    // ell(0,0) covers [0,3]x[0,1] ∪ [0,1]x[1,3].
    // Rotated-L: the 3x3 square minus its bottom-left 2x2 corner,
    // covers [0,3]x[2,3] ∪ [2,3]x[0,2] — area 5.
    val rl = GPolygon(Poly(Ring(Vector(
      Pt(2, 0), Pt(3, 0), Pt(3, 3), Pt(0, 3), Pt(0, 2), Pt(2, 2), Pt(2, 0)))))
    assert(math.abs(Ops.area(rl) - 5.0) < 1e-12)
    // overlap: [2,3]x[0,1] (ell's bottom arm x rl's right arm) = 1
    //        ∪ [0,1]x[2,3] (ell's left arm x rl's top arm)      = 1
    // -> TWO disjoint components, total 2
    assert(math.abs(Ops.intersectionArea(ell(0, 0), rl) - 2.0) < 1e-9)
    assert(math.abs(Ops.intersectionArea(rl, ell(0, 0)) - 2.0) < 1e-9)
  }

  test("concave intersection: identical, contained, disjoint, touching") {
    val L = ell(0, 0)
    assert(math.abs(Ops.intersectionArea(L, L) - 5.0) < 1e-9)            // identical
    assert(math.abs(Ops.intersectionArea(L, rect(0, 0, 9, 9)) - 5.0) < 1e-9) // contained
    assert(math.abs(Ops.intersectionArea(L, ell(10, 10))) < 1e-9)        // disjoint
    // edge contact only (shares the segment x=3, y in [0,1]): area 0
    assert(math.abs(Ops.intersectionArea(L, rect(3, 0, 5, 1))) < 1e-9)
    // vertex contact only: area 0
    assert(math.abs(Ops.intersectionArea(L, rect(3, 1, 5, 3))) < 1e-9)
  }

  test("holes subtract by inclusion-exclusion") {
    // 4x4 square with a centered 2x2 hole (donut, area 12)
    val donut = GPolygon(Poly(
      Ring(Vector(Pt(0, 0), Pt(4, 0), Pt(4, 4), Pt(0, 4), Pt(0, 0))),
      Vector(Ring(Vector(Pt(1, 1), Pt(3, 1), Pt(3, 3), Pt(1, 3), Pt(1, 1))))))
    // window covering the left half [0,2]x[0,4]: donut part there is
    // 2*4 minus the hole's left half 1*2 = 6
    assert(math.abs(Ops.intersectionArea(donut, rect(0, 0, 2, 4)) - 6.0) < 1e-9)
    // window strictly inside the hole: 0
    assert(math.abs(Ops.intersectionArea(donut, rect(1.25, 1.25, 2.75, 2.75))) < 1e-9)
    // donut x donut = donut area
    assert(math.abs(Ops.intersectionArea(donut, donut) - 12.0) < 1e-9)
  }

  test("U-shape x bar: three components") {
    // U: [0,5]x[0,1] base with arms [0,1]x[1,4] and [4,5]x[1,4]
    val u = GPolygon(Poly(Ring(Vector(
      Pt(0, 0), Pt(5, 0), Pt(5, 4), Pt(4, 4), Pt(4, 1),
      Pt(1, 1), Pt(1, 4), Pt(0, 4), Pt(0, 0)))))
    assert(math.abs(Ops.area(u) - 11.0) < 1e-12)
    // horizontal bar crossing both arms at height [2,3]: overlap =
    // two 1x1 arm pieces
    assert(math.abs(Ops.intersectionArea(u, rect(-1, 2, 6, 3)) - 2.0) < 1e-9)
    // C-shape (U rotated) interlocked with U: hand-check via symmetry
    val bar = rect(0, 2, 5, 3)
    assert(math.abs(Ops.intersectionArea(u, bar) - 2.0) < 1e-9)
  }

  test("multipolygon x multipolygon accumulates over part pairs") {
    val mpa = GMultiPolygon(Vector(rect(0, 0, 2, 2).poly, rect(4, 0, 6, 2).poly))
    val mpb = GMultiPolygon(Vector(rect(1, 1, 5, 3).poly))
    // overlaps: [1,2]x[1,2] = 1 and [4,5]x[1,2] = 1
    assert(math.abs(Ops.intersectionArea(mpa, mpb) - 2.0) < 1e-9)
  }

  // ---- intersection GEOMETRY output ----

  /** All distinct vertices of a geometry, rounded for comparison. */
  private def vtx(g: Geom): Set[(Double, Double)] = {
    def rnd(d: Double) = math.rint(d * 1e9) / 1e9
    g match {
      case GPolygon(p) => p.rings.flatMap(_.pts.dropRight(1)).map(p => (rnd(p.x), rnd(p.y))).toSet
      case GMultiPolygon(ps) =>
        ps.flatMap(_.rings.flatMap(_.pts.dropRight(1))).map(p => (rnd(p.x), rnd(p.y))).toSet
      case GPoint(p) => Set((rnd(p.x), rnd(p.y)))
    }
  }

  test("intersection geometry: rectangle overlap is the overlap box") {
    val got = Ops.intersection(rect(0, 0, 4, 4), rect(2, 1, 6, 3))
    assert(math.abs(Ops.area(got) - 4.0) < 1e-9)
    assert(vtx(got) === Set((2.0, 1.0), (4.0, 1.0), (4.0, 3.0), (2.0, 3.0)))
    assert(got.isInstanceOf[GPolygon])
    // round-trips through WKT
    assert(vtx(Wkt.read(Wkt.write(got))) === vtx(got))
  }

  test("intersection geometry: interlocking Ls give two unit squares") {
    val rl = GPolygon(Poly(Ring(Vector(
      Pt(2, 0), Pt(3, 0), Pt(3, 3), Pt(0, 3), Pt(0, 2), Pt(2, 2), Pt(2, 0)))))
    val got = Ops.intersection(ell(0, 0), rl)
    val parts = got match { case GMultiPolygon(ps) => ps; case GPolygon(p) => Vector(p); case _ => Vector() }
    assert(parts.length === 2, s"expected 2 components, got ${Wkt.write(got)}")
    assert(parts.forall(p => math.abs(math.abs(p.shell.signedArea) - 1.0) < 1e-9))
    assert(vtx(got) === Set(
      (2.0, 0.0), (3.0, 0.0), (3.0, 1.0), (2.0, 1.0),   // [2,3]x[0,1]
      (0.0, 2.0), (1.0, 2.0), (1.0, 3.0), (0.0, 3.0)))  // [0,1]x[2,3]
  }

  test("intersection geometry: disjoint / edge / vertex contact are EMPTY") {
    assert(Wkt.write(Ops.intersection(ell(0, 0), ell(10, 10))) === "MULTIPOLYGON EMPTY")
    assert(Wkt.write(Ops.intersection(ell(0, 0), rect(3, 0, 5, 1))) === "MULTIPOLYGON EMPTY")
    assert(Wkt.write(Ops.intersection(ell(0, 0), rect(3, 1, 5, 3))) === "MULTIPOLYGON EMPTY")
  }

  test("intersection geometry: identical and contained shapes return the shape") {
    val L = ell(0, 0)
    for (got <- Seq(Ops.intersection(L, L), Ops.intersection(L, rect(0, 0, 9, 9)),
                    Ops.intersection(rect(0, 0, 9, 9), L))) {
      assert(math.abs(Ops.area(got) - 5.0) < 1e-9, Wkt.write(got))
      assert(vtx(got) === vtx(L), Wkt.write(got))
    }
  }

  test("intersection geometry: window cutting through a hole yields a simple notch") {
    val donut = GPolygon(Poly(
      Ring(Vector(Pt(0, 0), Pt(4, 0), Pt(4, 4), Pt(0, 4), Pt(0, 0))),
      Vector(Ring(Vector(Pt(1, 1), Pt(3, 1), Pt(3, 3), Pt(1, 3), Pt(1, 1))))))
    val got = Ops.intersection(donut, rect(0, 0, 2, 4))
    assert(math.abs(Ops.area(got) - 6.0) < 1e-9, Wkt.write(got))
    // the hole is CUT OPEN by the window edge -> one simple C-shaped
    // polygon, no interior ring
    got match {
      case GPolygon(p) => assert(p.holes.isEmpty, Wkt.write(got))
      case other => fail(s"expected one polygon: ${Wkt.write(other)}")
    }
    assert(vtx(got) === Set(
      (0.0, 0.0), (2.0, 0.0), (2.0, 1.0), (1.0, 1.0),
      (1.0, 3.0), (2.0, 3.0), (2.0, 4.0), (0.0, 4.0)))
  }

  test("intersection geometry: donut x donut preserves the hole") {
    val donut = GPolygon(Poly(
      Ring(Vector(Pt(0, 0), Pt(4, 0), Pt(4, 4), Pt(0, 4), Pt(0, 0))),
      Vector(Ring(Vector(Pt(1, 1), Pt(3, 1), Pt(3, 3), Pt(1, 3), Pt(1, 1))))))
    val got = Ops.intersection(donut, donut)
    assert(math.abs(Ops.area(got) - 12.0) < 1e-9, Wkt.write(got))
    got match {
      case GPolygon(p) => assert(p.holes.length === 1, Wkt.write(got))
      case other => fail(s"expected one holed polygon: ${Wkt.write(other)}")
    }
    assert(vtx(got) === vtx(donut))
  }

  test("intersection geometry: area always matches intersectionArea") {
    val donut = GPolygon(Poly(
      Ring(Vector(Pt(0, 0), Pt(4, 0), Pt(4, 4), Pt(0, 4), Pt(0, 0))),
      Vector(Ring(Vector(Pt(1, 1), Pt(3, 1), Pt(3, 3), Pt(1, 3), Pt(1, 1))))))
    val u = GPolygon(Poly(Ring(Vector(
      Pt(0, 0), Pt(5, 0), Pt(5, 4), Pt(4, 4), Pt(4, 1),
      Pt(1, 1), Pt(1, 4), Pt(0, 4), Pt(0, 0)))))
    val rl = GPolygon(Poly(Ring(Vector(
      Pt(2, 0), Pt(3, 0), Pt(3, 3), Pt(0, 3), Pt(0, 2), Pt(2, 2), Pt(2, 0)))))
    val shapes: Seq[Geom] = Seq(ell(0, 0), rl, donut, u,
      rect(0, 0, 4, 4), rect(2, 1, 6, 3), rect(-1, 2, 6, 3),
      GMultiPolygon(Vector(rect(0, 0, 2, 2).poly, rect(4, 0, 6, 2).poly)))
    for (a <- shapes; b <- shapes) {
      val viaGeom = Ops.area(Ops.intersection(a, b))
      val viaArea = Ops.intersectionArea(a, b)
      assert(math.abs(viaGeom - viaArea) < 1e-9,
        s"area mismatch: $viaGeom vs $viaArea for ${Wkt.write(a)} x ${Wkt.write(b)}")
    }
  }
}
