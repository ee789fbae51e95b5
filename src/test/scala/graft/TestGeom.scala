package graft

/** Shared geometry builders for acceptance-fixture ports. Fixtures with
  * carmen:zxy and no geometry become tile-box MultiPolygons, matching the
  * reference test helper (lib/indexer/addfeature.js:104-117).
  */
object TestGeom {
  def pt(lon: Double, lat: Double): String =
    s"""{"type":"Point","coordinates":[$lon,$lat]}"""

  def mpt(pts: (Double, Double)*): String =
    pts.map { case (x, y) => s"[$x,$y]" }
      .mkString("""{"type":"MultiPoint","coordinates":[""", ",", "]}")

  def poly(w: Double, s: Double, e: Double, n: Double): String =
    s"""{"type":"Polygon","coordinates":[[[$w,$s],[$w,$n],[$e,$n],[$e,$s],[$w,$s]]]}"""

  def tileLon(z: Int, x: Double): Double = x / (1L << z) * 360.0 - 180.0

  def tileLat(z: Int, y: Double): Double = {
    val yf = y / (1L << z)
    math.toDegrees(math.atan(math.sinh(math.Pi * (1 - 2 * yf))))
  }

  def tilePoly(z: Int, tiles: (Int, Int)*): String = {
    def ring(x: Int, y: Int): String = {
      val (w, e) = (tileLon(z, x), tileLon(z, x + 1))
      val (n, s) = (tileLat(z, y), tileLat(z, y + 1))
      s"[[[$w,$s],[$e,$s],[$e,$n],[$w,$n],[$w,$s]]]"
    }
    tiles.map { case (x, y) => ring(x, y) }
      .mkString("""{"type":"MultiPolygon","coordinates":[""", ",", "]}")
  }
}
