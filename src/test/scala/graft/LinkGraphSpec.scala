package graft

import org.apache.spark.sql.functions._

import graft.operators.LinkGraph

/** Fixed-point PageRank: bit-parity with a driver reference of the
  * same integer arithmetic, float-drift bound, fixture-graph shape. */
class LinkGraphSpec extends SparkSuite {
  import spark.implicits._

  private val Scale = 1000000000L

  /** Driver reference: the same integer recurrence, computed with
    * plain Scala maps — independent of Spark's join/agg machinery. */
  private def refRanks(edges: Seq[(Long, Long)], nodes: Seq[Long],
                       iters: Int): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = 3L * Scale / 20L
    var r = nodes.map(_ -> Scale).toMap
    for (_ <- 0 until iters) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / deg(u) }.sum).toMap
      r = nodes.map(v => v -> (base + 17L * in.getOrElse(v, 0L) / 20L)).toMap
    }
    r
  }

  test("bit-parity with the driver reference on a hand graph (dangling node included)") {
    // 0→1, 0→2, 1→0, 2→0, 2→1; node 3 dangles (no out-edges, one in)
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 0L), (2L, 0L), (2L, 1L), (0L, 3L))
    val nodes = Seq(0L, 1L, 2L, 3L)
    val got = LinkGraph.pageRankFixedPoint(
        edges.toDF("src", "dst"), nodes.toDF("id"), "src", "dst", "id",
        iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == refRanks(edges, nodes, 4))
    // dangling node 3's mass leaks: totals shrink below n·scale but
    // never below n·base — the documented leak, not a bug
    assert(got.values.sum < 4 * Scale)
    assert(got.values.forall(_ >= 3L * Scale / 20L))
  }

  test("integer trajectory tracks the float formulation within iters/scale") {
    val d = spark.range(0, 200).toDF("doc_id")
    val edges = LinkGraph.hashedFixtureEdges(spark, d, "doc_id")
      .as[(Long, Long)].collect().toSeq
    val nodes = (0L until 200L).toSeq
    val got = LinkGraph.pageRankFixedPoint(edges.toDF("src", "dst"),
        nodes.toDF("id"), "src", "dst", "id", iters = 5)
      .as[(Long, Long)].collect().toMap
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var rf = nodes.map(_ -> 1.0).toMap
    for (_ <- 0 until 5) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => rf(u) / deg(u) }.sum).toMap
      rf = nodes.map(v => v -> (0.15 + 0.85 * in.getOrElse(v, 0.0))).toMap
    }
    // each integer step floors ≤ 2 divisions: drift < ~iters·2/scale,
    // assert an order of magnitude of headroom
    val drift = nodes.map(v => math.abs(got(v).toDouble / Scale - rf(v))).max
    assert(drift < 1e-7, s"drift $drift")
  }

  /** Driver reference triangle counts: brute O(n³) over the adjacency
    * set — independent of orientation and join machinery. */
  private def refTriangles(edges: Seq[(Long, Long)],
                           nodes: Seq[Long]): Map[Long, Long] = {
    val adj = edges.flatMap { case (u, v) => Seq((u, v), (v, u)) }
      .filter { case (u, v) => u != v }.toSet
    val cnt = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    val ns = nodes.sorted
    for {
      i <- ns; j <- ns if j > i && adj((i, j))
      k <- ns if k > j && adj((j, k)) && adj((i, k))
    } { cnt(i) += 1; cnt(j) += 1; cnt(k) += 1 }
    nodes.map(v => v -> cnt(v)).toMap
  }

  test("triangleCounts equals brute force on seeded random multigraphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val n = 40 + trial * 30
      val nodes = (0L until n.toLong).toSeq
      // dense enough for triangles; parallel edges + self-loops
      // included on purpose — the operator must canonicalize them
      val edges = Seq.fill(n * 4)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val got = LinkGraph.triangleCounts(edges.toDF("src", "dst"),
          nodes.toDF("id"), "src", "dst", "id")
        .as[(Long, Long)].collect().toMap
      val want = refTriangles(edges, nodes)
      assert(got == want, s"trial $trial")
      assert(want.values.sum > 0, s"trial $trial fixture has no triangles")
    }
  }

  test("triangleCounts: complete graph K5 has C(3,5)=10 triangles, 6 per node") {
    val nodes = (0L until 5L).toSeq
    val edges = for (i <- nodes; j <- nodes if i < j) yield (i, j)
    val got = LinkGraph.triangleCounts(edges.toDF("src", "dst"),
        nodes.toDF("id"), "src", "dst", "id")
      .as[(Long, Long)].collect().toMap
    assert(got == nodes.map(_ -> 6L).toMap)
  }

  test("kcore: hand graph peels to the unique core; fixture reaches " +
    "the fixed point inside the round budget") {
    // triangle 0-1-2 each also linked to tail node 3; 3-4 pendant:
    // 2-core = the triangle + 3? deg(3)=4 (0,1,2,4): after round 1,
    // 4 drops (deg 1); 3 keeps deg 3; core = {0,1,2,3}: 3's degree
    // to survivors is 3 >= 2 -> stays. Pendant 4 is out.
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (0L, 3L), (1L, 3L), (2L, 3L), (3L, 4L))
    val nodes = (0L to 4L).toSeq
    val got = LinkGraph.kcore(edges.toDF("src", "dst"), nodes.toDF("id"),
        "src", "dst", "id", k = 2, rounds = 4)
      .as[(Long, Boolean, Long)].collect()
      .map { case (id, c, dg) => id -> ((c, dg)) }.toMap
    assert(got(0L) == ((true, 3L)) && got(1L) == ((true, 3L)) &&
      got(2L) == ((true, 3L)) && got(3L) == ((true, 3L)))
    assert(got(4L) == ((false, 0L)))
    // chain 10-11-12-13: every node peels at k=2 (ends first, then
    // inward) — needs MULTIPLE rounds, proving rounds compose
    val chain = Seq((10L, 11L), (11L, 12L), (12L, 13L))
    val cn = Seq(10L, 11L, 12L, 13L)
    val g2 = LinkGraph.kcore(chain.toDF("src", "dst"), cn.toDF("id"),
        "src", "dst", "id", k = 2, rounds = 4)
      .as[(Long, Boolean, Long)].collect()
    assert(g2.forall(r => !r._2 && r._3 == 0L))
    // q121's fixture reaches the FIXED POINT within its 8-round
    // budget: rounds=8 equals rounds=9 exactly
    val d = spark.range(0, 300).toDF("doc_id")
    val e = LinkGraph.hashedFixtureEdges(spark, d, "doc_id", "tri:", 6)
    val r8 = LinkGraph.kcore(e, d, "src", "dst", "doc_id", 3, 8)
      .orderBy("doc_id").collect().toSeq
    val r9 = LinkGraph.kcore(e, d, "src", "dst", "doc_id", 3, 9)
      .orderBy("doc_id").collect().toSeq
    assert(r8 === r9, "fixture not converged within 8 rounds")
  }

  test("hashed fixture: outdeg 1 + v%3, targets in [0, n), deterministic") {
    val d = spark.range(0, 300).toDF("doc_id")
    val e = LinkGraph.hashedFixtureEdges(spark, d, "doc_id")
    val degs = e.groupBy("src").count().as[(Long, Long)].collect().toMap
    assert((0L until 300L).forall(v => degs(v) == 1 + v % 3))
    assert(e.filter(col("dst") < 0 || col("dst") >= 300).count() == 0)
    assert(e.orderBy("src", "dst").collect() sameElements
      LinkGraph.hashedFixtureEdges(spark, d, "doc_id").orderBy("src", "dst").collect())
  }
}
