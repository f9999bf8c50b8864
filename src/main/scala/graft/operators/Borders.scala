package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions._

/** Distributed Queen-contiguity border detection.
  *
  * Reference: pycart/border_util.py:5 `get_borders` — libpysal Queen
  * weights (neighbour = shares an edge OR a vertex), weight = length of
  * the shared boundary (`intersection(...).length`), islands dropped.
  *
  * Spark-first design: instead of libpysal's all-pairs matrix (O(n^2),
  * single node), geometries are binned into a MULTI-LEVEL grid keyed by
  * their own size class, so candidate pairs come from equi-joins on
  * (level, cell) and the shuffle stays O(n * levels-per-geom). A
  * single-level grid sized to the LARGEST bbox (the previous design)
  * is outlier-hostile: one continent-sized polygon among parcels
  * inflates every cell until the whole input collapses into a handful
  * of buckets and the join degenerates quadratic. Here the base cell
  * is the MEDIAN extent (robust to outliers), each geometry lives at
  * level l = ceil(log2(extent / base)) where the cell is base * 2^l
  * (so every geometry spans at most 2x2 cells at its own level), and a
  * geometry is additionally registered in its ancestor cells at every
  * OCCUPIED coarser level (the distinct native levels are a <= 64-value
  * aggregate). A pair joins exactly at the coarser of the two native
  * levels, anchored to the cell holding the bbox-intersection min
  * corner — each unordered pair is emitted exactly once, outliers only
  * pay candidates against what their bbox actually overlaps, and the
  * small-geometry fine grid keeps its selectivity.
  *
  * At 100 TB / millions of polygons, the only shuffle is the
  * (level, cell) groupBy (AQE-splittable when a cell is hot); the
  * exact geometry work stays data-local. The base cell size and the
  * native-level set are two scalar-sized aggregates.
  */
object Borders {

  /** @param df   (idCol, geomCol WKT)
    * @return symmetric DataFrame: focal_id, neighbor_id, weight
    *         (shared boundary length; 0.0 for vertex-only contact)
    */
  def compute(df: DataFrame, idCol: String, geomCol: String): DataFrame = {
    val withBox = df
      .select(col(idCol).as("id"), col(geomCol).as("geom"))
      .withColumn("bbox", st_bbox(col("geom")))
      .withColumn("minx", col("bbox")(0)).withColumn("miny", col("bbox")(1))
      .withColumn("maxx", col("bbox")(2)).withColumn("maxy", col("bbox")(3))
      .drop("bbox")
      .withColumn("extent", greatest(col("maxx") - col("minx"), col("maxy") - col("miny")))

    // Robust base cell: the MEDIAN extent (approx; outliers cannot
    // inflate it). One scalar aggregate.
    val Array(cellRow) = withBox
      .agg(percentile_approx(col("extent"), lit(0.5), lit(10000)).as("cs"))
      .collect()
    val cs0 = math.max(if (cellRow.isNullAt(0)) 0.0 else cellRow.getDouble(0), 1e-12)

    // Size class: cell at level l is cs0 * 2^l >= extent, so each
    // geometry spans at most 2 cells per axis at its own level.
    val leveled = withBox.withColumn("level",
      when(col("extent") <= cs0, 0)
        .otherwise(ceil(log(2.0, col("extent") / cs0)).cast("int")))

    // Occupied levels only (<= ~64 distinct values): geometries
    // register in ancestor cells at coarser levels ONLY where some
    // geometry natively lives, so a heavy tail costs O(#distinct
    // levels) rows per geometry, not O(log(max/min)).
    val collected = leveled.select(col("level")).distinct()
      .collect().map(_.getInt(0)).sorted
    val nativeLevels = if (collected.isEmpty) Array(0) else collected

    val binned = leveled
      .withColumn("L", explode(filter(
        array(nativeLevels.map(lit(_)): _*), l => l >= col("level"))))
      .withColumn("cs", lit(cs0) * pow(lit(2.0), col("L").cast("double")))
      .withColumn("cx0", floor(col("minx") / col("cs"))).withColumn("cx1", floor(col("maxx") / col("cs")))
      .withColumn("cy0", floor(col("miny") / col("cs"))).withColumn("cy1", floor(col("maxy") / col("cs")))
      .withColumn("cell", explode(flatten(transform(
        sequence(col("cx0"), col("cx1")),
        cx => transform(sequence(col("cy0"), col("cy1")),
          cy => struct(cx.as("x"), cy.as("y")))))))
      .drop("cx0", "cx1", "cy0", "cy1")

    val l = binned.select(
      col("id").as("l_id"), col("geom").as("l_geom"), col("L"), col("cell"),
      col("cs"), col("level").as("l_level"),
      col("minx").as("l_minx"), col("miny").as("l_miny"),
      col("maxx").as("l_maxx"), col("maxy").as("l_maxy"))
    val r = binned.select(
      col("id").as("r_id"), col("geom").as("r_geom"), col("L"), col("cell"),
      col("level").as("r_level"),
      col("minx").as("r_minx"), col("miny").as("r_miny"),
      col("maxx").as("r_maxx"), col("maxy").as("r_maxy"))

    val pairs = l.join(r, Seq("L", "cell"))
      .filter(col("l_id") < col("r_id"))
      // each pair joins ONLY at the coarser of its two native levels
      .filter(greatest(col("l_level"), col("r_level")) === col("L"))
      // bboxes must intersect at all
      .filter(col("l_minx") <= col("r_maxx") && col("r_minx") <= col("l_maxx") &&
              col("l_miny") <= col("r_maxy") && col("r_miny") <= col("l_maxy"))
      // emit each pair from exactly one cell: the one holding the
      // bbox-intersection min corner (at this level's cell size)
      .filter(col("cell.x") === floor(greatest(col("l_minx"), col("r_minx")) / col("cs")) &&
              col("cell.y") === floor(greatest(col("l_miny"), col("r_miny")) / col("cs")))
      .filter(st_touches(col("l_geom"), col("r_geom")))
      .withColumn("weight", st_shared_border(col("l_geom"), col("r_geom")))
      .select(col("l_id"), col("r_id"), col("weight"))

    pairs.select(col("l_id").as("focal_id"), col("r_id").as("neighbor_id"), col("weight"))
      .unionAll(pairs.select(col("r_id").as("focal_id"), col("l_id").as("neighbor_id"), col("weight")))
  }
}
