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
}
