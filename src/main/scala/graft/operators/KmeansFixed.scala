package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FIXED-POINT integer Lloyd k-means — the q104 discipline applied
  * to clustering (the r6 verdict's task #3), so that ONE trained
  * quantizer path joins the DuckDB oracle gate: every arithmetic
  * step is integer (quantize → squared-L2 argmin → floor-division
  * centroid update), hence bit-replayable by chained CTE rounds.
  * [[Similarity.trainKmeans]] remains the float PRODUCTION path —
  * this is the gate-tier counterpart, exactly the q59/q137 split.
  *
  * Pinned arithmetic (each piece chosen to be engine-agnostic):
  *  - quantize: iv_d = floor(v_d · 1024 + 0.5) — float→double
  *    promotion and one IEEE multiply/add, identical cross-engine;
  *  - assign: argmin_c Σ_d (iv_d − c_d)², ties to the smallest
  *    cluster index, realized as min(dist·k + c) over a combined
  *    integer key;
  *  - update: c'_d = floor(Σ iv_d / n) via the sign-safe identity
  *    (s − ((s mod n) + n) mod n) / n, which makes the numerator
  *    exactly divisible so ANY engine's integer division agrees;
  *    empty clusters carry their previous centroid.
  *
  * Scale shape: centroids are k×D longs (driver/broadcast-sized);
  * each round is ONE map-side pass (broadcast centroids, per-row
  * argmin UDF) into ONE partial aggregation whose shuffle carries
  * k·(D+1) longs per partition (per-dim sums as D agg columns — no
  * row explosion). Rounds are driver-looped like every Lloyd.
  */
object KmeansFixed {

  /** Quantize a float vector column to the integer grid. */
  def quantizeUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((v: Seq[Float]) =>
      if (v == null) null
      else v.map(x => math.floor(x.toDouble * 1024.0 + 0.5).toLong).toArray)

  private[operators] def assignUdf(cents: Array[Array[Long]]) =
    udf((iv: Seq[Long]) => {
      val k = cents.length
      var bestC = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < k) {
        var d = 0L
        var i = 0
        while (i < iv.length) {
          val t = iv(i) - cents(c)(i)
          d += t * t
          i += 1
        }
        if (d < bestD) { bestD = d; bestC = c } // strict: ties keep smaller c
        c += 1
      }
      (bestC, bestD)
    })

  private def floorDiv(s: Long, n: Long): Long = Math.floorDiv(s, n)

  /** Train `iters` rounds from the vectors of the `k` smallest ids
    * (the deterministic seed). Input: (idCol, vecCol float array).
    * @return final centroids, k × D */
  def train(df: DataFrame, idCol: String, vecCol: String,
            k: Int, iters: Int): Array[Array[Long]] = {
    val q = df.select(col(idCol).cast("long").as("id"),
        quantizeUdf(col(vecCol)).as("iv"))
      .filter(col("iv").isNotNull)
      .localCheckpoint()
    val seeds = q.orderBy(col("id")).limit(k).collect()
    require(seeds.length == k, s"need >= $k vectors to seed")
    var cents = seeds.map(_.getAs[Seq[Long]]("iv").toArray)
    val dims = cents(0).length
    for (_ <- 0 until iters) {
      val asg = q.withColumn("a", assignUdf(cents)(col("iv")))
        .select(col("a._1").as("c"), col("iv"))
      val sumCols = (0 until dims).map(d =>
        sum(element_at(col("iv"), d + 1)).as(s"s$d")) :+
        count(lit(1)).as("cnt")
      val agg = asg.groupBy(col("c")).agg(sumCols.head, sumCols.tail: _*)
        .collect().map(r => r.getInt(0) ->
          ((0 until dims).map(d => r.getLong(d + 1)).toArray,
            r.getLong(dims + 1))).toMap
      cents = Array.tabulate(k) { c =>
        agg.get(c) match {
          case Some((sums, cnt)) if cnt > 0 =>
            Array.tabulate(dims)(d => floorDiv(sums(d), cnt))
          case _ => cents(c) // empty cluster keeps its centroid
        }
      }
    }
    cents
  }

  /** The q138 gate surface: per (cluster, dim) the final centroid
    * value, with cluster-level n_points and total inertia (Σ min
    * squared distance) riding along — every number an exact integer
    * the oracle replays via 3 chained CTE rounds. */
  def gateSurface(df: DataFrame, idCol: String, vecCol: String,
                  k: Int, iters: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cents = train(df, idCol, vecCol, k, iters)
    val dims = cents(0).length
    val q = df.select(col(idCol).cast("long").as("id"),
        quantizeUdf(col(vecCol)).as("iv"))
      .filter(col("iv").isNotNull)
    val asg = q.withColumn("a", assignUdf(cents)(col("iv")))
      .select(col("a._1").as("c"), col("a._2").as("dist"))
    val stats = asg.groupBy(col("c"))
      .agg(count(lit(1)).as("n_points"), sum(col("dist")).as("inertia"))
    val centRows = cents.zipWithIndex.flatMap { case (v, c) =>
      v.zipWithIndex.map { case (x, d) => (c.toLong, d.toLong, x) }
    }.toSeq.toDF("cluster", "dim", "c_val")
    centRows.join(stats.withColumnRenamed("c", "cluster"), Seq("cluster"), "left")
      .select(col("cluster"), col("dim"), col("c_val"),
        coalesce(col("n_points"), lit(0L)).as("n_points"),
        coalesce(col("inertia"), lit(0L)).as("inertia"))
  }
}
