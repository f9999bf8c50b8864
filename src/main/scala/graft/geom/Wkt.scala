package graft.geom

/** WKT codec for the kernel's geometry types.
  *
  * Supports POINT, POLYGON (with holes), MULTIPOLYGON — the shapes the
  * reference round-trips through GeoDataFrames. Coordinates render via
  * the shortest double representation so exact values survive the
  * round trip bit-for-bit.
  */
object Wkt {

  def write(g: Geom): String = g match {
    case GPoint(p) => s"POINT (${num(p.x)} ${num(p.y)})"
    case GPolygon(poly) => s"POLYGON ${polyBody(poly)}"
    case GMultiPolygon(polys) if polys.isEmpty => "MULTIPOLYGON EMPTY"
    case GMultiPolygon(polys) =>
      polys.map(polyBody).mkString("MULTIPOLYGON (", ", ", ")")
  }

  private def num(d: Double): String =
    if (d == d.toLong.toDouble && math.abs(d) < 1e15) d.toLong.toString else d.toString

  private def ringBody(r: Ring): String =
    r.pts.map(p => s"${num(p.x)} ${num(p.y)}").mkString("(", ", ", ")")

  private def polyBody(p: Poly): String =
    (Iterator(p.shell) ++ p.holes.iterator).map(ringBody).mkString("(", ", ", ")")

  def read(s: String): Geom = {
    val t = s.trim
    val upper = t.toUpperCase
    if (upper.startsWith("MULTIPOLYGON") && upper.endsWith("EMPTY")) {
      GMultiPolygon(Vector.empty)
    } else if (upper.startsWith("POINT")) {
      val nums = parseNums(t.substring(t.indexOf('(')))
      GPoint(Pt(nums(0), nums(1)))
    } else if (upper.startsWith("MULTIPOLYGON")) {
      val body = t.substring(t.indexOf('('))
      GMultiPolygon(splitTop(stripParens(body)).map(p => parsePoly(p)).toVector)
    } else if (upper.startsWith("POLYGON")) {
      val body = t.substring(t.indexOf('('))
      GPolygon(parsePoly(stripParens(body)))
    } else sys.error(s"unsupported WKT: ${t.take(30)}")
  }

  /** body = "(ring), (ring)..." without the outermost parens. */
  private def parsePoly(body: String): Poly = {
    val rings = splitTop(body).map { r =>
      val nums = parseNums(r)
      Ring((0 until nums.length / 2).map(i => Pt(nums(2 * i), nums(2 * i + 1))))
    }
    Poly(rings.head, rings.tail.toVector)
  }

  private def stripParens(s: String): String = {
    val t = s.trim
    require(t.startsWith("(") && t.endsWith(")"), s"bad WKT body: ${t.take(20)}")
    t.substring(1, t.length - 1)
  }

  /** Split on commas at paren depth 0, stripping one paren level from
    * each element. */
  private def splitTop(s: String): IndexedSeq[String] = {
    val out = Vector.newBuilder[String]
    var depth = 0; var start = -1
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => if (depth == 0) start = i + 1; depth += 1
        case ')' => depth -= 1; if (depth == 0) out += s.substring(start, i)
        case _ =>
      }
      i += 1
    }
    out.result()
  }

  private def parseNums(s: String): Array[Double] = {
    val b = Array.newBuilder[Double]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '-' || c == '+' || c == '.' || (c >= '0' && c <= '9')) {
        var j = i
        while (j < s.length && { val d = s.charAt(j)
          d == '-' || d == '+' || d == '.' || d == 'e' || d == 'E' || (d >= '0' && d <= '9') }) j += 1
        b += java.lang.Double.parseDouble(s.substring(i, j))
        i = j
      } else i += 1
    }
    b.result()
  }
}
