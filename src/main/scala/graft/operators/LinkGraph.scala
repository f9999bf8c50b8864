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

  /** The q104 fixture graph over a contiguous-id corpus: node v has
    * outdeg 1 + v % 3, edge t targeting the portable md5 draw
    * fold60("link:v:t") mod n — deterministic, engine-replayable,
    * self-loops allowed (they keep outdeg ≥ 1 everywhere: no
    * dangling nodes by construction). */
  def hashedFixtureEdges(spark: SparkSession, docs: DataFrame,
                         idCol: String): DataFrame = {
    val n = docs.count()
    docs.select(col(idCol).as("src"),
        explode(sequence(lit(0), (col(idCol) % 3).cast("int"))).as("t"))
      .select(col("src"),
        (conv(substring(md5(concat(lit("link:"), col("src").cast("string"),
          lit(":"), col("t").cast("string"))), 1, 15), 16, 10)
          .cast("long") % n).as("dst"))
  }
}
