package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.PlanUtil

/** Link-graph centrality for corpus curation (SURVEY.md §2.E
  * adjacents): web-graph PageRank as a document-quality prior — the
  * page-level signal crawl curation uses alongside the text-level
  * filters (Gopher rules, classifiers): a page many curated pages
  * link to is likelier worth keeping than an orphan.
  *
  * The rank arithmetic is FIXED-POINT INTEGER, not float: ranks live
  * on a `scale` grid (default 1e9), each power-iteration step is
  * integer division and int64 sums, so the result is bit-identical
  * on any engine, any partitioning, any iteration order — the same
  * exactness discipline as the q46 packing sums — and a DuckDB
  * oracle can replay every iteration as a chained CTE (the q48 BPE
  * pattern). The float formulation differs from this one by < 1/scale
  * per step; the spec pins the drift bound.
  *
  * Scale shape (the Pregel loop, declared in DataFrames): per
  * iteration ONE join (ranks ⋈ edges on src — co-locatable when the
  * edge table is pre-partitioned by src, and AQE picks broadcast for
  * rank tables that fit) and ONE groupBy(dst) sum; ranks are
  * re-materialized each round via [[PlanUtil.checkpointFlat]] so
  * lineage and stats stay O(1) in the iteration count (the Dorling
  * lesson). int64 headroom: sum of contributions ≤ n·scale, so
  * dNum·sum needs n·scale·dNum < 2^63 — 5·10^8 nodes at the default
  * scale/damping; past that, lower `scale`.
  */
object LinkGraph {

  /** Fixed-point power-iteration PageRank.
    *
    * r₀(v) = scale; rₖ₊₁(v) = (dDen−dNum)·scale/dDen +
    * dNum·(Σ_{u→v} rₖ(u) div outdeg(u)) div dDen — all divisions
    * integer (operands non-negative, so floor == truncate on both
    * engines). Nodes absent from `edges` contribute nothing
    * (dangling mass leaks, the common simplification); nodes nobody
    * links to hold the base term.
    *
    * @param edges (srcCol, dstCol) directed edges; parallel edges
    *              count multiply
    * @param nodes one row per node (idCol) — the rank universe
    * @return (idCol, rank) with rank on the `scale` grid */
  def pageRankFixedPoint(edges: DataFrame, nodes: DataFrame,
                         srcCol: String, dstCol: String, idCol: String,
                         iters: Int, scale: Long = 1000000000L,
                         dNum: Long = 17L, dDen: Long = 20L): DataFrame = {
    require(iters >= 0 && scale > 0 && dNum >= 0 && dDen > dNum,
      s"bad params: iters=$iters scale=$scale d=$dNum/$dDen")
    val base = (dDen - dNum) * scale / dDen
    // outdeg once; the per-iteration join then carries (src, dst, outdeg)
    val deg = edges.groupBy(col(srcCol).as("__src")).agg(count(lit(1)).as("__deg"))
    val e = PlanUtil.checkpointFlat(
      edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
        .join(deg, "__src"))
    val ids = nodes.select(col(idCol).as("__id"))
    var ranks = ids.withColumn("rank", lit(scale))
    for (_ <- 0 until iters) {
      val in = e.join(ranks, e("__src") === ranks("__id"))
        .select(col("__dst"), expr("rank div __deg").as("__c"))
        .groupBy(col("__dst")).agg(sum(col("__c")).as("__in"))
      ranks = PlanUtil.checkpointFlat(
        ids.join(in, ids("__id") === in("__dst"), "left")
          .select(col("__id"),
            (lit(base) + expr(s"$dNum * coalesce(__in, 0L) div $dDen")).as("rank")))
    }
    ranks.select(col("__id").as(idCol), col("rank"))
  }

  /** Per-node triangle counts — the local clustering signal web-graph
    * curation pairs with PageRank (a page whose neighbors also link
    * each other sits in a genuine community; link farms and orphans
    * have near-zero closure).
    *
    * Exact, and scale-shaped via DEGREE-ORDERED orientation (the
    * node-iterator++ / forward algorithm, public in Schank & Wagner
    * 2005): each undirected edge is directed from its lower
    * (degree, id) endpoint to the higher, so every triangle is
    * enumerated EXACTLY once from its minimum vertex and — the scale
    * point — out-degrees are bounded by O(√m), which bounds the
    * wedge join to O(m^1.5) pairs regardless of hub skew. An
    * id-ordered orientation would hand a celebrity node's whole
    * neighborhood to one reducer; (degree, id) order caps it.
    *
    * Plan: ONE distinct on canonical (least, greatest) edges, one
    * degree aggregate joined back, a self-join on the oriented
    * source (the wedge generator), and a LEFT SEMI join probing the
    * closing edge — triangles never materialize payloads, only ids.
    *
    * @return (idCol, n_tri) over ALL nodes, 0 for triangle-free */
  def triangleCounts(edges: DataFrame, nodes: DataFrame,
                     srcCol: String, dstCol: String,
                     idCol: String): DataFrame = {
    val u = edges.select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = u.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    // (s → t) with ord(s) < ord(t), ord = (degree, id); carry dst ord
    // so the wedge join can order its two legs without re-joining deg
    val aOrd = struct(col("da").as("d"), col("a").as("i"))
    val bOrd = struct(col("db").as("d"), col("b").as("i"))
    val aLower = aOrd < bOrd
    val oriented = u
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(when(aLower, col("a")).otherwise(col("b")).as("s"),
        when(aLower, bOrd).otherwise(aOrd).as("tord"))
      .select(col("s"), col("tord"), col("tord.i").as("t"))
    val w1 = oriented.select(col("s"), col("tord").as("yord"), col("t").as("y"))
    val w2 = oriented.select(col("s"), col("tord").as("zord"), col("t").as("z"))
    val wedges = w1.join(w2, Seq("s")).filter(col("yord") < col("zord"))
      .select(col("s").as("x"), col("y"), col("z"))
    val closed = wedges.join(
      oriented.select(col("s").as("y"), col("t").as("z")),
      Seq("y", "z"), "left_semi")
    val perNode = closed
      .select(explode(array(col("x"), col("y"), col("z"))).as("__v"))
      .groupBy(col("__v")).agg(count(lit(1)).as("n_tri"))
    nodes.select(col(idCol))
      .join(perNode, col(idCol) === col("__v"), "left")
      .select(col(idCol), coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }

  /** Fixed-round k-core peeling — the third web-graph curation
    * signal beside PageRank and triangle closure (a page outside the
    * 2-core hangs off the graph by a thread; link farms often form
    * dense cores with no external support, spam-detectable by
    * coreness vs PageRank mismatch).
    *
    * Each round drops every surviving node whose degree among
    * SURVIVORS is < k (the classic peel; the k-core is the unique
    * fixed point). Rounds are FIXED at `rounds` rather than
    * data-dependent, for the q104 reason: a bounded loop is
    * bit-replayable as chained oracle CTEs, and the spec pins that
    * the fixture reaches the fixed point well inside the budget (a
    * production run sizes `rounds` to its graph's measured peel
    * depth or loops to convergence; peel depth is worst-case O(n) —
    * a path peels one end per round — but small on real web graphs,
    * where most nodes sit far from the core boundary).
    *
    * Plan per round: ONE degree aggregate over surviving canonical
    * edges + two semi-joins restricting the edge set;
    * checkpointFlat keeps lineage O(1) in rounds (the Dorling
    * lesson).
    *
    * @return (idCol, in_core: survived all rounds, core_deg: final
    *         degree among survivors, 0 outside) */
  def kcore(edges: DataFrame, nodes: DataFrame, srcCol: String,
            dstCol: String, idCol: String, k: Int,
            rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, s"bad params: k=$k rounds=$rounds")
    var e = PlanUtil.checkpointFlat(
      edges.select(least(col(srcCol), col(dstCol)).as("a"),
          greatest(col(srcCol), col(dstCol)).as("b"))
        .filter(col("a") =!= col("b")).distinct())
    for (_ <- 0 until rounds) {
      val deg = e.select(explode(array(col("a"), col("b"))).as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select(col("v"))
      e = PlanUtil.checkpointFlat(
        e.join(keep.select(col("v").as("a")), Seq("a"), "left_semi")
          .join(keep.select(col("v").as("b")), Seq("b"), "left_semi"))
    }
    val finalDeg = e.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("core_deg"))
    nodes.select(col(idCol))
      .join(finalDeg, col(idCol) === col("v"), "left")
      .select(col(idCol),
        (col("core_deg").isNotNull && col("core_deg") >= k).as("in_core"),
        coalesce(col("core_deg"), lit(0L)).as("core_deg"))
  }

  /** The q104 fixture graph over a contiguous-id corpus: node v has
    * outdeg 1 + v % 3, edge t targeting the portable md5 draw
    * fold60("link:v:t") mod n — deterministic, engine-replayable,
    * self-loops allowed (they keep outdeg ≥ 1 everywhere: no
    * dangling nodes by construction). */
  def hashedFixtureEdges(spark: SparkSession, docs: DataFrame,
                         idCol: String, prefix: String = "link:",
                         fanMod: Int = 3): DataFrame = {
    val n = docs.count()
    docs.select(col(idCol).as("src"),
        explode(sequence(lit(0), (col(idCol) % fanMod).cast("int"))).as("t"))
      .select(col("src"),
        (conv(substring(md5(concat(lit(prefix), col("src").cast("string"),
          lit(":"), col("t").cast("string"))), 1, 15), 16, 10)
          .cast("long") % n).as("dst"))
  }
}
