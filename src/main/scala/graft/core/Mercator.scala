package graft.core

/** Web-Mercator projection math, semantics of @mapbox/sphericalmercator
  * (public, as consumed by the reference at lib/util/proximity.js:4-10,
  * lib/util/bbox.js:2-8) with tile size 256.
  */
object Mercator {
  val TileSize: Double = 256.0
  private val D2R = math.Pi / 180.0
  private val R2D = 180.0 / math.Pi

  @inline private def size(zoom: Int): Double = TileSize * StrictMath.pow(2, zoom)

  /** lon/lat -> pixel x/y at integer zoom (rounded, clamped to world size).
    * Mirrors sphericalmercator `px()` for integer zooms.
    */
  def px(lon: Double, lat: Double, zoom: Int): (Double, Double) = {
    val ac = size(zoom)           // world size in px
    val bc = ac / 360.0           // px per degree lon
    val cc = ac / (2 * math.Pi)   // px per radian
    val zc = ac / 2               // origin offset
    val f = math.min(math.max(StrictMath.sin(D2R * lat), -0.9999), 0.9999)
    var x = JsNum.jsRound(zc + lon * bc)
    var y = JsNum.jsRound(zc + 0.5 * StrictMath.log((1 + f) / (1 - f)) * -cc)
    if (x > ac) x = ac
    if (y > ac) y = ac
    (x, y)
  }

  /** pixel x/y at zoom -> lon/lat. Mirrors sphericalmercator `ll()`. */
  def ll(pxX: Double, pxY: Double, zoom: Int): (Double, Double) = {
    val ac = size(zoom)
    val bc = ac / 360.0
    val cc = ac / (2 * math.Pi)
    val zc = ac / 2
    val g = (pxY - zc) / -cc
    val lon = (pxX - zc) / bc
    val lat = R2D * (2 * StrictMath.atan(StrictMath.exp(g)) - 0.5 * math.Pi)
    (lon, lat)
  }

  /** carmen center2zxy (reference lib/util/proximity.js:74-82):
    * clamp lon/lat, project, divide px by 256 with JS rounding.
    */
  def center2zxy(lon: Double, lat: Double, z: Int): (Int, Int, Int) = {
    val cLon = math.min(180.0, math.max(-180.0, lon))
    val cLat = math.min(85.0511, math.max(-85.0511, lat))
    val (x, y) = px(cLon, cLat, z)
    (z, JsNum.jsRound(x / TileSize).toInt, JsNum.jsRound(y / TileSize).toInt)
  }

  /** Tile-fraction coordinates (tilebelt pointToTileFraction semantics, used
    * by tile-cover): unrounded tile x/y with x wrapped into [0, 2^z).
    */
  def pointToTileFraction(lon: Double, lat: Double, z: Int): (Double, Double) = {
    val sin = StrictMath.sin(lat * D2R)
    val z2 = StrictMath.pow(2, z)
    var x = z2 * (lon / 360.0 + 0.5)
    val y = z2 * (0.5 - 0.25 * StrictMath.log((1 + sin) / (1 - sin)) / math.Pi)
    x = x % z2
    if (x < 0) x = x + z2
    (x, y)
  }

  /** tilebelt pointToTile: floor of the fraction. */
  def pointToTile(lon: Double, lat: Double, z: Int): (Int, Int) = {
    val (x, y) = pointToTileFraction(lon, lat, z)
    (math.floor(x).toInt, math.floor(y).toInt)
  }

  /** Haversine great-circle distance, @turf/distance semantics
    * (earth radius 6371008.8 m), in the requested unit factor.
    */
  private val EarthRadiusM = 6371008.8
  private val MilesFactor = EarthRadiusM / 1609.344

  def haversineMiles(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val dLat = D2R * (lat2 - lat1)
    val dLon = D2R * (lon2 - lon1)
    val a = StrictMath.pow(StrictMath.sin(dLat / 2), 2) +
      StrictMath.pow(StrictMath.sin(dLon / 2), 2) * StrictMath.cos(D2R * lat1) * StrictMath.cos(D2R * lat2)
    2 * StrictMath.atan2(StrictMath.sqrt(a), StrictMath.sqrt(1 - a)) * MilesFactor
  }
}
