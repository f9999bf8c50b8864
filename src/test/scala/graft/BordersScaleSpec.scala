package graft

import org.apache.spark.sql.functions._
import graft.operators.{Borders, Dorling}

/** Cartogram operators at a few hundred regions (the driver fixtures
  * have 4): a 20x20 full tessellation has a closed-form Queen
  * adjacency structure, so border counts/weights verify exactly, and
  * the Dorling loop must stay finite and converging. */
class BordersScaleSpec extends SparkSuite {

  val n = 20
  lazy val grid = {
    import spark.implicits._
    (0 until n * n).map { k =>
      val gx = k % n; val gy = k / n
      val (x0, y0, x1, y1) = (gx * 4, gy * 4, gx * 4 + 4, gy * 4 + 4)
      (k.toLong,
        s"POLYGON (($x0 $y0, $x1 $y0, $x1 $y1, $x0 $y1, $x0 $y0))",
        1.0 + (k % 7))
    }.toDF("id", "geometry", "value")
  }

  test("Queen borders on a 20x20 tessellation match the closed form") {
    val b = Borders.compute(grid, "id", "geometry").collect()
    // directed neighbor count: interior 8, edge 5, corner 3
    val expected = 8 * (n - 2) * (n - 2) + 5 * 4 * (n - 2) + 3 * 4
    assert(b.length === expected)
    // edge-adjacent pairs weigh the full side (4.0), diagonal pairs 0
    b.foreach { r =>
      val i = r.getAs[Long]("focal_id"); val j = r.getAs[Long]("neighbor_id")
      val (xi, yi) = (i % n, i / n); val (xj, yj) = (j % n, j / n)
      val manhattan = math.abs(xi - xj) + math.abs(yi - yj)
      val w = r.getAs[Double]("weight")
      if (manhattan == 1) assert(w === 4.0, s"pair $i-$j") else assert(w === 0.0, s"pair $i-$j")
    }
  }

  test("Queen borders stay exact and bounded with a 100x-extent outlier polygon") {
    import spark.implicits._
    // the 20x20 unit-ish tessellation (extent 4) plus one strip 100x
    // the median extent sitting directly on the grid's top edge: the
    // old max-extent grid would inflate EVERY cell to 400 and collapse
    // the whole input into a handful of buckets; the leveled grid must
    // keep the tessellation's fine cells and still find the strip's
    // adjacencies exactly once.
    val top = 4 * n
    val big = Seq(((n * n).toLong,
      s"POLYGON ((0 $top, 400 $top, 400 ${top + 400}, 0 ${top + 400}, 0 $top))",
      1.0)).toDF("id", "geometry", "value")
    val t0 = System.nanoTime()
    val b = Borders.compute(grid.unionAll(big), "id", "geometry").collect()
    val secs = (System.nanoTime() - t0) / 1e9
    // grid-internal adjacency unchanged
    val gridPairs = b.filter(r => r.getAs[Long]("focal_id") < n * n &&
      r.getAs[Long]("neighbor_id") < n * n)
    val expected = 8 * (n - 2) * (n - 2) + 5 * 4 * (n - 2) + 3 * 4
    assert(gridPairs.length === expected)
    // the strip touches exactly the n top-row cells, sharing their
    // full 4.0 top edges (x in [0, 4n] ⊂ [0, 400])
    val bigPairs = b.filter(_.getAs[Long]("focal_id") === n.toLong * n)
    assert(bigPairs.length === n, s"strip adjacencies: ${bigPairs.length}")
    bigPairs.foreach { r =>
      val nb = r.getAs[Long]("neighbor_id")
      assert(nb >= (n - 1).toLong * n && nb < n.toLong * n, s"non-top-row neighbor $nb")
      assert(r.getAs[Double]("weight") === 4.0)
    }
    info(f"outlier borders in $secs%.1f s")
    assert(secs < 60.0, s"outlier grid too slow: $secs s — candidate blow-up?")
  }

  test("driver-side Jacobi fast path matches the distributed step on 400 regions") {
    val fast = Dorling.run(grid, "id", "value", "geometry", iterations = 3)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("x"), r.getAs[Double]("y"))).toMap
    val dist = Dorling.run(grid, "id", "value", "geometry", iterations = 3, smallN = 0)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("x"), r.getAs[Double]("y"))).toMap
    assert(fast.keySet === dist.keySet)
    // same Jacobi model; only double-vs-decimal summation differs
    fast.foreach { case (id, (fx, fy)) =>
      val (dx, dy) = dist(id)
      assert(math.abs(fx - dx) < 1e-6 && math.abs(fy - dy) < 1e-6, s"region $id")
    }
  }

  test("Jacobi path drift compounds bounded over 30 iterations") {
    // The per-iteration rounding drift between the two paths compounds;
    // this pins the documented envelope (Dorling.run scaladoc: ~1e-5 at
    // 30 iterations, extrapolating to ~1e-4 at the default 100).
    val fast = Dorling.run(grid, "id", "value", "geometry", iterations = 30)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("x"), r.getAs[Double]("y"))).toMap
    val dist = Dorling.run(grid, "id", "value", "geometry", iterations = 30, smallN = 0)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("x"), r.getAs[Double]("y"))).toMap
    var maxDrift = 0.0
    fast.foreach { case (id, (fx, fy)) =>
      val (dx, dy) = dist(id)
      maxDrift = math.max(maxDrift, math.max(math.abs(fx - dx), math.abs(fy - dy)))
    }
    info(f"max positional drift after 30 iterations: $maxDrift%.2e")
    assert(maxDrift < 1e-5, s"drift $maxDrift exceeds documented envelope")
  }

  test("Dorling stays finite and reduces overlap on 400 regions") {
    val t0 = System.nanoTime()
    val out = Dorling.run(grid, "id", "value", "geometry", iterations = 10, smallN = 0)
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(out.length === n * n)
    out.foreach { r =>
      assert(!r.getAs[Double]("x").isNaN && !r.getAs[Double]("y").isNaN)
      assert(r.getAs[Double]("radius") > 0)
    }
    info(f"10 Dorling iterations over ${n * n} regions: $secs%.1f s")
    assert(secs < 120.0, s"Dorling too slow: $secs s")
  }
}
