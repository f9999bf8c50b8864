package graft.geom

/** Pointwise CRS reprojection for the geometry kernel.
  *
  * Closes the one geo-surface gap the reference leaves open: pycart
  * only TAGS a CRS (set_crs — mirrored by sources.GeoCrs), but any
  * user mixing sources eventually needs an actual `to_crs`. Supported
  * systems (every pair transforms, chained through lon/lat):
  *
  *  - EPSG:4326 — WGS84 longitude/latitude in degrees
  *  - EPSG:3857 — spherical ("Web") Mercator meters, R = 6378137:
  *      x = R·λ·π/180
  *      y = R·ln(tan(π/4 + φ·π/360))
  *    with the exact inverse φ = (2·atan(exp(y/R)) − π/2)·180/π.
  *  - EPSG:326zz / 327zz — UTM zone zz (01..60) north/south on the
  *    WGS84 ellipsoid (a = 6378137, 1/f = 298.257223563, k0 =
  *    0.9996, false easting 500 km, false northing 10 000 km south),
  *    via the classic transverse Mercator series — Snyder, "Map
  *    Projections: A Working Manual", USGS PP 1395 (1987), eqs.
  *    8-9..8-13 (forward) and 8-17..8-25 (inverse). Published
  *    accuracy is centimeters inside the zone; the spec pins the
  *    published CN Tower control point and sub-cm round trips.
  *
  * Spherical-Mercator formulas are exact for the spherical model;
  * the TM series is the standard surveying expansion. Inputs outside
  * a projection's domain (|lat| ≥ 90 for Mercator, |lat| > 84 or
  * more than 9° of longitude off the zone's central meridian for
  * UTM) fail loudly, as do unknown CRS names — data never passes
  * through silently mis-framed.
  *
  * Pure per-point math over immutable values — runs data-local
  * inside Spark expressions at any scale, like the rest of the
  * kernel.
  */
object Proj {

  private val R = 6378137.0
  /** Web Mercator's latitude of validity: atan(sinh(pi)) in degrees. */
  val MaxLat: Double = math.atan(math.sinh(math.Pi)).toDegrees

  // WGS84 ellipsoid + UTM convention
  private val A = 6378137.0
  private val F = 1.0 / 298.257223563
  private val E2 = F * (2.0 - F)
  private val Ep2 = E2 / (1.0 - E2)
  private val K0 = 0.9996
  private val FalseEasting = 500000.0
  private val FalseNorthingSouth = 10000000.0

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

  /** Meridian arc length from the equator to latitude `phi` (Snyder
    * eq. 3-21, WGS84 coefficients). */
  private def meridianArc(phi: Double): Double =
    A * ((1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256) * phi -
      (3 * E2 / 8 + 3 * E2 * E2 / 32 + 45 * E2 * E2 * E2 / 1024) * math.sin(2 * phi) +
      (15 * E2 * E2 / 256 + 45 * E2 * E2 * E2 / 1024) * math.sin(4 * phi) -
      (35 * E2 * E2 * E2 / 3072) * math.sin(6 * phi))

  /** Central meridian of UTM zone `zone`, in degrees. */
  private def centralMeridian(zone: Int): Double = (zone - 1) * 6.0 - 180.0 + 3.0

  private def lonLatToUtm(zone: Int, south: Boolean)(p: Pt): Pt = {
    require(p.y.abs <= 84.0,
      s"latitude ${p.y} is outside UTM's domain (|lat| <= 84)")
    val dLon = p.x - centralMeridian(zone)
    require(dLon.abs <= 9.0,
      s"longitude ${p.x} is ${dLon.abs} degrees off zone $zone's central meridian " +
        "(supported: <= 9)")
    val phi = math.toRadians(p.y)
    val sinP = math.sin(phi); val cosP = math.cos(phi); val tanP = math.tan(phi)
    val n = A / math.sqrt(1 - E2 * sinP * sinP)
    val t = tanP * tanP
    val c = Ep2 * cosP * cosP
    val a1 = math.toRadians(dLon) * cosP
    val m = meridianArc(phi)
    val x = K0 * n * (a1 +
      (1 - t + c) * a1 * a1 * a1 / 6 +
      (5 - 18 * t + t * t + 72 * c - 58 * Ep2) * math.pow(a1, 5) / 120) + FalseEasting
    val y0 = K0 * (m + n * tanP * (a1 * a1 / 2 +
      (5 - t + 9 * c + 4 * c * c) * math.pow(a1, 4) / 24 +
      (61 - 58 * t + t * t + 600 * c - 330 * Ep2) * math.pow(a1, 6) / 720))
    Pt(x, if (south) y0 + FalseNorthingSouth else y0)
  }

  private def utmToLonLat(zone: Int, south: Boolean)(p: Pt): Pt = {
    val x = p.x - FalseEasting
    val y = if (south) p.y - FalseNorthingSouth else p.y
    val m = y / K0
    val mu = m / (A * (1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256))
    val e1 = (1 - math.sqrt(1 - E2)) / (1 + math.sqrt(1 - E2))
    val phi1 = mu +
      (3 * e1 / 2 - 27 * e1 * e1 * e1 / 32) * math.sin(2 * mu) +
      (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
      (151 * e1 * e1 * e1 / 96) * math.sin(6 * mu) +
      (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
    val sinP = math.sin(phi1); val cosP = math.cos(phi1); val tanP = math.tan(phi1)
    val c1 = Ep2 * cosP * cosP
    val t1 = tanP * tanP
    val n1 = A / math.sqrt(1 - E2 * sinP * sinP)
    val r1 = A * (1 - E2) / math.pow(1 - E2 * sinP * sinP, 1.5)
    val d = x / (n1 * K0)
    val phi = phi1 - (n1 * tanP / r1) * (d * d / 2 -
      (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * Ep2) * math.pow(d, 4) / 24 +
      (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * Ep2 - 3 * c1 * c1) *
        math.pow(d, 6) / 720)
    val lon = centralMeridian(zone) + math.toDegrees(
      (d - (1 + 2 * t1 + c1) * d * d * d / 6 +
        (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * Ep2 + 24 * t1 * t1) *
          math.pow(d, 5) / 120) / cosP)
    Pt(lon, math.toDegrees(phi))
  }

  /** EPSG code of the natural UTM zone for a lon/lat point (pure 6°
    * zones; the Norway/Svalbard grid exceptions are a map-sheet
    * convention, not part of the EPSG zone definitions). */
  def utmEpsg(lon: Double, lat: Double): String = {
    val zone = math.min(60, math.max(1, (math.floor((lon + 180.0) / 6.0) + 1).toInt))
    val base = if (lat >= 0) 32600 else 32700
    f"EPSG:${base + zone}%d"
  }

  private val UtmRe = "EPSG:32([67])(\\d\\d)".r

  /** (toLonLat, fromLonLat) for a supported CRS, None otherwise. */
  private def decode(crs: String): Option[(Pt => Pt, Pt => Pt)] = norm(crs) match {
    case "EPSG:4326" => Some((identity, identity))
    case "EPSG:3857" => Some((mercatorToLonLat, lonLatToMercator))
    case UtmRe(hemi, zz) if zz.toInt >= 1 && zz.toInt <= 60 =>
      val south = hemi == "7"
      Some((utmToLonLat(zz.toInt, south), lonLatToUtm(zz.toInt, south)))
    case _ => None
  }

  /** The supported directed pairs: any two of 4326 / 3857 / UTM. */
  def supports(from: String, to: String): Boolean =
    norm(from) == norm(to) || (decode(from).isDefined && decode(to).isDefined)

  /** Reproject every vertex of `g` from `from` to `to`. */
  def transform(g: Geom, from: String, to: String): Geom =
    if (norm(from) == norm(to)) g
    else (decode(from), decode(to)) match {
      case (Some((toLL, _)), Some((_, fromLL))) => g.map(p => fromLL(toLL(p)))
      case _ => throw new IllegalArgumentException(
        s"unsupported CRS transform ${norm(from)} -> ${norm(to)} " +
          "(supported: EPSG:4326, EPSG:3857, EPSG:326xx/327xx UTM zones)")
    }
}
