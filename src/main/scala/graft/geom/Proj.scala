package graft.geom

/** Pointwise CRS reprojection for the geometry kernel.
  *
  * Closes the one geo-surface gap the reference leaves open: pycart
  * only TAGS a CRS (set_crs — mirrored by sources.GeoCrs), but any
  * user mixing sources eventually needs an actual `to_crs`. Scope is
  * the closed-form spherical pair every web-mapping stack shares:
  *
  *  - EPSG:4326 — WGS84 longitude/latitude in degrees
  *  - EPSG:3857 — spherical ("Web") Mercator meters, R = 6378137:
  *      x = R·λ·π/180
  *      y = R·ln(tan(π/4 + φ·π/360))
  *    with the exact inverse φ = (2·atan(exp(y/R)) − π/2)·180/π.
  *
  * The formulas are exact for the spherical model (round-trip to
  * float precision — spec'd); no ellipsoidal datum shifts are
  * attempted (a Helmert/TM chain without an independent oracle would
  * be unverifiable here). Unknown CRS pairs fail loudly rather than
  * pass data through silently mis-framed.
  *
  * Pure per-point math over immutable values — runs data-local
  * inside Spark expressions at any scale, like the rest of the
  * kernel.
  */
object Proj {

  private val R = 6378137.0
  /** Web Mercator's latitude of validity: atan(sinh(pi)) in degrees. */
  val MaxLat: Double = math.atan(math.sinh(math.Pi)).toDegrees

  private def norm(crs: String): String = crs.trim.toUpperCase

  private def lonLatToMercator(p: Pt): Pt = {
    require(p.y.abs < 90.0,
      s"latitude ${p.y} is outside Web Mercator's domain (|lat| < 90)")
    Pt(R * math.toRadians(p.x),
      R * math.log(math.tan(math.Pi / 4.0 + math.toRadians(p.y) / 2.0)))
  }

  private def mercatorToLonLat(p: Pt): Pt =
    Pt(math.toDegrees(p.x / R),
      math.toDegrees(2.0 * math.atan(math.exp(p.y / R)) - math.Pi / 2.0))

  /** The supported directed pairs. */
  def supports(from: String, to: String): Boolean = {
    val (f, t) = (norm(from), norm(to))
    f == t ||
      (f == "EPSG:4326" && t == "EPSG:3857") ||
      (f == "EPSG:3857" && t == "EPSG:4326")
  }

  /** Reproject every vertex of `g` from `from` to `to`. */
  def transform(g: Geom, from: String, to: String): Geom = (norm(from), norm(to)) match {
    case (f, t) if f == t    => g
    case ("EPSG:4326", "EPSG:3857") => g.map(lonLatToMercator)
    case ("EPSG:3857", "EPSG:4326") => g.map(mercatorToLonLat)
    case (f, t) => throw new IllegalArgumentException(
      s"unsupported CRS transform $f -> $t (supported: EPSG:4326 <-> EPSG:3857)")
  }
}
