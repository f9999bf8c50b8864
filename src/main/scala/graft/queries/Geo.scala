package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GeoFunctions._
import graft.operators.{Borders, Dorling, NonContiguous}

/** Block B — geometry + cartogram queries (SURVEY.md §2.B).
  *
  * The driver's tables carry no geometry, so these queries build
  * synthetic region polygons from the `nation` table: a 5x5 grid of
  * axis-aligned squares with INTEGER coordinates (spacing 4). Integer
  * coords make every kernel computation (shoelace area, centroid,
  * perimeter, shared borders) EXACT in doubles, so the DuckDB oracle
  * can state the same arithmetic in closed form and match
  * bit-for-bit. Region "population" is the real per-nation customer
  * count, so the data still flows from the driver's tables.
  *
  * The queries run the REAL kernel + operators (st_* UDFs,
  * Borders/NonContiguous/Dorling) — the oracle only re-derives what
  * the answers must be. Reference parity for irregular float
  * geometry is covered by GeomSpec/CartogramSpec on the reference's
  * own fixture.
  */
object Geo {

  /** 5x5 grid squares from nation keys. side: 1+key%3 (varied, q20/21)
    * or 4 (full tessellation — neighbors share edges, q22/23/24). */
  private def squares(spark: SparkSession, dir: String, tessellate: Boolean): DataFrame = {
    val n = Tables.nation(spark, dir)
      .withColumn("gx", col("n_nationkey") % 5)
      .withColumn("gy", floor(col("n_nationkey") / 5).cast("int"))
      .withColumn("s", if (tessellate) lit(4) else lit(1) + col("n_nationkey") % 3)
      .withColumn("x0", col("gx") * 4).withColumn("y0", col("gy") * 4)
      .withColumn("x1", col("gx") * 4 + col("s")).withColumn("y1", col("gy") * 4 + col("s"))
    n.withColumn("wkt", concat(
        lit("POLYGON (("),
        col("x0"), lit(" "), col("y0"), lit(", "),
        col("x1"), lit(" "), col("y0"), lit(", "),
        col("x1"), lit(" "), col("y1"), lit(", "),
        col("x0"), lit(" "), col("y1"), lit(", "),
        col("x0"), lit(" "), col("y0"), lit("))")))
      .select(col("n_nationkey"), col("wkt"))
  }

  /** Squares + per-nation customer count as the cartogram value. */
  private def valued(spark: SparkSession, dir: String, tessellate: Boolean): DataFrame = {
    val cnt = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("cnt"))
    squares(spark, dir, tessellate)
      .join(cnt, col("n_nationkey") === col("c_nationkey"), "left")
      .select(col("n_nationkey"), col("wkt"),
        coalesce(col("cnt"), lit(1L)).as("value"))
  }

  /** SQL fragment mirroring `squares` for the oracle. */
  private def sqlSquares(tessellate: Boolean): String = {
    val side = if (tessellate) "4" else "1 + n_nationkey % 3"
    s"""sq AS (
       |  SELECT n_nationkey,
       |    (n_nationkey % 5) * 4 AS x0,
       |    CAST(floor(n_nationkey / 5) AS INT) * 4 AS y0,
       |    ($side) AS s
       |  FROM nation)""".stripMargin
  }

  private val sqlValued =
    """vals AS (
      |  SELECT sq.*, coalesce(cnt, 1) AS value FROM sq
      |  LEFT JOIN (SELECT c_nationkey, count(*) AS cnt
      |             FROM customer GROUP BY c_nationkey) c
      |    ON sq.n_nationkey = c.c_nationkey)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_geo_measures" -> q20,
    "q21_noncontiguous" -> q21,
    "q22_borders_queen" -> q22,
    "q23_dorling_radii" -> q23,
    "q24_dorling_step" -> q24,
    "q25_intersection" -> q25
  )

  /** Kernel measures (area/perimeter/centroid/bbox) over WKT, via
    * the decode-once struct: one st_measures parse per row feeds all
    * five output columns (the per-measure UDFs would re-parse the
    * WKT once per column; GeoSqlSpec plan-asserts the single
    * invocation). */
  def q20(spark: SparkSession, dir: String): DataFrame =
    squares(spark, dir, tessellate = false)
      .select(col("n_nationkey"), st_measures(col("wkt")).as("m"))
      .select(
        col("n_nationkey"),
        col("m.area").as("area"),
        col("m.perimeter").as("perimeter"),
        col("m.cx").as("cx"),
        col("m.cy").as("cy"),
        col("m.maxx").as("maxx"))
      .orderBy(col("n_nationkey"))

  /** Full NonContiguous operator; output = scale + scaled bbox. */
  def q21(spark: SparkSession, dir: String): DataFrame = {
    val out = NonContiguous.run(valued(spark, dir, tessellate = false),
      "n_nationkey", "value", "wkt")
    out.select(
        col("id").as("n_nationkey"), col("value"), col("scale"),
        st_bbox(col("geometry"))(0).as("minx"),
        st_bbox(col("geometry"))(1).as("miny"),
        st_bbox(col("geometry"))(2).as("maxx"),
        st_bbox(col("geometry"))(3).as("maxy"))
      .orderBy(col("n_nationkey"))
  }

  /** Full distributed Queen-borders operator on the tessellation. */
  def q22(spark: SparkSession, dir: String): DataFrame =
    Borders.compute(squares(spark, dir, tessellate = true), "n_nationkey", "wkt")
      .select(col("focal_id").cast("int").as("focal"),
        col("neighbor_id").cast("int").as("neighbor"), col("weight"))
      .orderBy(col("focal"), col("neighbor"))

  /** Dorling radius model (k = D/R over Queen pairs). */
  def q23(spark: SparkSession, dir: String): DataFrame = {
    val (regions, _) = Dorling.radii(valued(spark, dir, tessellate = true),
      "n_nationkey", "value", "wkt")
    regions.select(col("id").cast("int").as("n_nationkey"), col("value"),
        col("radius"))
      .orderBy(col("n_nationkey"))
  }

  /** One Jacobi step of the Dorling force model, SQL-oracle-verified:
    * the per-focal force sums are exact decimal aggregations (order-
    * independent), so the oracle can restate the entire force model —
    * candidate radius search, border-weighted attraction, repulsion
    * caps, ratio/friction blend — in closed form over the grid. */
  def q24(spark: SparkSession, dir: String): DataFrame = {
    val df = valued(spark, dir, tessellate = true)
    val borders = Borders.compute(df, "n_nationkey", "wkt").localCheckpoint()
    val (regions, _) = Dorling.radii(df, "n_nationkey", "value", "wkt", Some(borders))
    val widest = regions.agg(max(col("radius"))).collect()(0).getDouble(0)
    Dorling.step(regions.select("id", "value", "x", "y", "perimeter", "radius"),
        borders, widest, ratio = 0.4, friction = 0.5)
      .select(col("id").cast("int").as("n_nationkey"), col("x"), col("y"), col("radius"))
      .orderBy(col("n_nationkey"))
  }

  /** General polygon intersection driver-gated end-to-end: a second
    * square per nation (x offset key%2, y offset 1, side 2) overlaps
    * the q20 square by a closed-form axis-aligned rectangle, so BOTH
    * clipper paths — the scalar st_intersection_area and the GEOMETRY
    * output st_area(st_intersection(...)) (ring stitching) — must
    * equal exact integer arithmetic. Side-1 keys have zero overlap
    * height and exercise the MULTIPOLYGON EMPTY result. Concave and
    * hole-carrying intersections stay spec-covered (ClipSpec). */
  def q25(spark: SparkSession, dir: String): DataFrame = {
    def rectWkt(x0: Column, y0: Column, x1: Column, y1: Column): Column = concat(
      lit("POLYGON (("),
      x0, lit(" "), y0, lit(", "), x1, lit(" "), y0, lit(", "),
      x1, lit(" "), y1, lit(", "), x0, lit(" "), y1, lit(", "),
      x0, lit(" "), y0, lit("))"))
    val n = Tables.nation(spark, dir)
      .withColumn("gx", col("n_nationkey") % 5)
      .withColumn("gy", floor(col("n_nationkey") / 5).cast("int"))
      .withColumn("s", lit(1) + col("n_nationkey") % 3)
      .withColumn("x0", col("gx") * 4).withColumn("y0", col("gy") * 4)
      .withColumn("xb", col("gx") * 4 + col("n_nationkey") % 2)
      .withColumn("yb", col("gy") * 4 + 1)
      .withColumn("wkta",
        rectWkt(col("x0"), col("y0"), col("x0") + col("s"), col("y0") + col("s")))
      .withColumn("wktb",
        rectWkt(col("xb"), col("yb"), col("xb") + lit(2), col("yb") + lit(2)))
    n.select(col("n_nationkey"),
        st_intersection_area(col("wkta"), col("wktb")).as("inter_area"),
        st_area(st_intersection(col("wkta"), col("wktb"))).as("inter_area_geom"))
      .orderBy(col("n_nationkey"))
  }

  def oracleSql: Map[String, String] = Map(
    "q25_intersection" ->
      """WITH sq AS (
        |  SELECT n_nationkey,
        |    (n_nationkey % 5) * 4 AS x0,
        |    CAST(floor(n_nationkey / 5) AS INT) * 4 AS y0,
        |    (1 + n_nationkey % 3) AS s,
        |    (n_nationkey % 5) * 4 + n_nationkey % 2 AS xb,
        |    CAST(floor(n_nationkey / 5) AS INT) * 4 + 1 AS yb
        |  FROM nation),
        |o AS (
        |  SELECT n_nationkey,
        |    greatest(0, least(x0 + s, xb + 2) - greatest(x0, xb)) *
        |    greatest(0, least(y0 + s, yb + 2) - greatest(y0, yb)) AS a
        |  FROM sq)
        |SELECT n_nationkey, CAST(a AS DOUBLE) AS inter_area,
        |  CAST(a AS DOUBLE) AS inter_area_geom
        |FROM o ORDER BY n_nationkey""".stripMargin,
    "q20_geo_measures" ->
      s"""WITH ${sqlSquares(tessellate = false)}
         |SELECT n_nationkey,
         |  CAST(s * s AS DOUBLE) AS area,
         |  CAST(4 * s AS DOUBLE) AS perimeter,
         |  x0 + s / 2.0 AS cx,
         |  y0 + s / 2.0 AS cy,
         |  CAST(x0 + s AS DOUBLE) AS maxx
         |FROM sq
         |ORDER BY n_nationkey""".stripMargin,
    "q21_noncontiguous" ->
      s"""WITH ${sqlSquares(tessellate = false)},
         |$sqlValued,
         |dens AS (
         |  SELECT *, CAST(value AS DOUBLE) / CAST(s * s AS DOUBLE) AS density,
         |    x0 + s / 2.0 AS cx, y0 + s / 2.0 AS cy
         |  FROM vals),
         |anch AS (SELECT max(density) AS anchor FROM dens)
         |SELECT n_nationkey, CAST(value AS DOUBLE) AS value,
         |  sqrt(density / anchor) * 1.0 AS scale,
         |  cx + (x0 - cx) * (sqrt(density / anchor) * 1.0) AS minx,
         |  cy + (y0 - cy) * (sqrt(density / anchor) * 1.0) AS miny,
         |  cx + (x0 + s - cx) * (sqrt(density / anchor) * 1.0) AS maxx,
         |  cy + (y0 + s - cy) * (sqrt(density / anchor) * 1.0) AS maxy
         |FROM dens, anch
         |ORDER BY n_nationkey""".stripMargin,
    "q22_borders_queen" ->
      s"""WITH ${sqlSquares(tessellate = true)}
         |SELECT a.n_nationkey AS focal, b.n_nationkey AS neighbor,
         |  CAST(CASE WHEN abs(a.x0 - b.x0) + abs(a.y0 - b.y0) = 4 THEN 4.0 ELSE 0.0 END AS DOUBLE) AS weight
         |FROM sq a JOIN sq b
         |  ON a.n_nationkey <> b.n_nationkey
         | AND abs(a.x0 - b.x0) <= 4 AND abs(a.y0 - b.y0) <= 4
         |ORDER BY focal, neighbor""".stripMargin,
    "q24_dorling_step" ->
      s"""WITH ${sqlSquares(tessellate = true)},
         |$sqlValued,
         |cent AS (
         |  SELECT n_nationkey, CAST(value AS DOUBLE) AS value,
         |    x0 + 2.0 AS cx, y0 + 2.0 AS cy, x0, y0
         |  FROM vals),
         |bpairs AS (
         |  SELECT a.n_nationkey AS f, b.n_nationkey AS n,
         |    CASE WHEN abs(a.x0 - b.x0) + abs(a.y0 - b.y0) = 4 THEN 4.0 ELSE 0.0 END AS weight
         |  FROM cent a JOIN cent b
         |    ON a.n_nationkey <> b.n_nationkey
         |   AND abs(a.x0 - b.x0) <= 4 AND abs(a.y0 - b.y0) <= 4),
         |kpairs AS (
         |  SELECT a.value AS fv, b.value AS nv,
         |    sqrt((b.cx - a.cx) * (b.cx - a.cx) + (b.cy - a.cy) * (b.cy - a.cy)) AS dist
         |  FROM cent a JOIN bpairs p ON a.n_nationkey = p.f
         |  JOIN cent b ON b.n_nationkey = p.n),
         |k AS (
         |  SELECT CAST(sum(CAST(dist AS DECIMAL(30,10))) AS DOUBLE) /
         |         CAST(sum(CAST(sqrt(fv / pi()) + sqrt(nv / pi()) AS DECIMAL(30,10))) AS DOUBLE) AS k
         |  FROM kpairs),
         |rad AS (
         |  SELECT n_nationkey, value, cx, cy, x0, y0,
         |    sqrt(value / pi()) * k AS radius
         |  FROM cent, k),
         |w AS (SELECT max(radius) AS widest FROM rad),
         |cand AS (
         |  SELECT f.n_nationkey AS f_id, n.n_nationkey AS n_id,
         |    f.cx AS fx, f.cy AS fy, n.cx AS nx, n.cy AS ny,
         |    f.radius AS f_radius, n.radius AS n_radius,
         |    sqrt((n.cx - f.cx) * (n.cx - f.cx) + (n.cy - f.cy) * (n.cy - f.cy)) AS dist
         |  FROM rad f CROSS JOIN w JOIN rad n
         |    ON f.n_nationkey <> n.n_nationkey
         |  WHERE sqrt((n.cx - f.cx) * (n.cx - f.cx) + (n.cy - f.cy) * (n.cy - f.cy)) > 0
         |    AND sqrt((n.cx - f.cx) * (n.cx - f.cx) + (n.cy - f.cy) * (n.cy - f.cy)) < w.widest + f.radius),
         |contrib AS (
         |  SELECT c.*,
         |    (c.n_radius + c.f_radius - c.dist) AS overlap,
         |    (c.nx - c.fx) AS dx, (c.ny - c.fy) AS dy,
         |    CASE WHEN p.weight IS NOT NULL
         |      THEN abs(c.n_radius + c.f_radius - c.dist) * p.weight / CAST(16 AS DOUBLE)
         |      ELSE (c.n_radius + c.f_radius - c.dist) END AS a_overlap
         |  FROM cand c LEFT JOIN bpairs p ON c.f_id = p.f AND c.n_id = p.n),
         |forces AS (
         |  SELECT f_id,
         |    CAST(sum(CAST(CASE WHEN overlap > 0 THEN -overlap * dx / dist ELSE 0.0 END AS DECIMAL(30,12))) AS DOUBLE) AS xrepel,
         |    CAST(sum(CAST(CASE WHEN overlap > 0 THEN -overlap * dy / dist ELSE 0.0 END AS DECIMAL(30,12))) AS DOUBLE) AS yrepel,
         |    CAST(sum(CAST(CASE WHEN overlap <= 0 THEN a_overlap * dx / dist ELSE 0.0 END AS DECIMAL(30,12))) AS DOUBLE) AS xattract,
         |    CAST(sum(CAST(CASE WHEN overlap <= 0 THEN a_overlap * dy / dist ELSE 0.0 END AS DECIMAL(30,12))) AS DOUBLE) AS yattract,
         |    min(dist) AS min_dist
         |  FROM contrib GROUP BY f_id),
         |joined AS (
         |  SELECT r.n_nationkey, r.cx, r.cy, r.radius,
         |    coalesce(f.xrepel, 0.0) AS xrepel, coalesce(f.yrepel, 0.0) AS yrepel,
         |    coalesce(f.xattract, 0.0) AS xattract, coalesce(f.yattract, 0.0) AS yattract,
         |    least(w.widest, coalesce(f.min_dist, w.widest)) AS closest
         |  FROM rad r CROSS JOIN w LEFT JOIN forces f ON r.n_nationkey = f.f_id),
         |blend AS (
         |  SELECT *,
         |    sqrt(xattract * xattract + yattract * yattract) AS attract_dist,
         |    sqrt(xrepel * xrepel + yrepel * yrepel) AS repel_dist0
         |  FROM joined),
         |scaled AS (
         |  SELECT *,
         |    CASE WHEN repel_dist0 > closest THEN closest * xrepel / (repel_dist0 + 1.0) ELSE xrepel END AS xrepel_s,
         |    CASE WHEN repel_dist0 > closest THEN closest * yrepel / (repel_dist0 + 1.0) ELSE yrepel END AS yrepel_s,
         |    least(repel_dist0, closest) AS repel_dist
         |  FROM blend),
         |scaled2 AS (
         |  SELECT *,
         |    CASE WHEN repel_dist <= 0 AND attract_dist > closest THEN closest * xattract / (attract_dist + 1.0) ELSE xattract END AS xattract_s,
         |    CASE WHEN repel_dist <= 0 AND attract_dist > closest THEN closest * yattract / (attract_dist + 1.0) ELSE yattract END AS yattract_s
         |  FROM scaled),
         |total AS (
         |  SELECT *,
         |    CASE WHEN repel_dist > 0
         |      THEN (1.0 - 0.4) * xrepel_s + 0.4 * (repel_dist * xattract / (attract_dist + 1.0))
         |      ELSE xattract_s END AS xtotal,
         |    CASE WHEN repel_dist > 0
         |      THEN (1.0 - 0.4) * yrepel_s + 0.4 * (repel_dist * yattract / (attract_dist + 1.0))
         |      ELSE yattract_s END AS ytotal
         |  FROM scaled2)
         |SELECT n_nationkey, cx + 0.5 * xtotal AS x, cy + 0.5 * ytotal AS y, radius
         |FROM total
         |ORDER BY n_nationkey""".stripMargin,
    "q23_dorling_radii" ->
      s"""WITH ${sqlSquares(tessellate = true)},
         |$sqlValued,
         |cent AS (
         |  SELECT n_nationkey, CAST(value AS DOUBLE) AS value,
         |    x0 + 2.0 AS cx, y0 + 2.0 AS cy, x0, y0
         |  FROM vals),
         |pairs AS (
         |  SELECT a.value AS fv, b.value AS nv,
         |    sqrt((b.cx - a.cx) * (b.cx - a.cx) + (b.cy - a.cy) * (b.cy - a.cy)) AS dist
         |  FROM cent a JOIN cent b
         |    ON a.n_nationkey <> b.n_nationkey
         |   AND abs(a.x0 - b.x0) <= 4 AND abs(a.y0 - b.y0) <= 4),
         |k AS (
         |  SELECT CAST(sum(CAST(dist AS DECIMAL(30,10))) AS DOUBLE) /
         |         CAST(sum(CAST(sqrt(fv / pi()) + sqrt(nv / pi()) AS DECIMAL(30,10))) AS DOUBLE) AS k
         |  FROM pairs)
         |SELECT n_nationkey, value, sqrt(value / pi()) * k AS radius
         |FROM cent, k
         |ORDER BY n_nationkey""".stripMargin
  )
}
