package graft.core

import scala.collection.mutable

/** ZXY tile cover of a geometry at a single zoom.
  *
  * Re-derivation of the public @mapbox/tile-cover algorithm as consumed by
  * the reference indexer (reference lib/indexer/indexdocs.js:229-264, always
  * called with min_zoom == max_zoom): points map to the containing tile via
  * mercator tile fractions; lines walk tile crossings with a DDA; polygons
  * cover their boundary rings and scanline-fill interior rows between
  * y-transition tiles. The emitted order mirrors the reference's JS object
  * key-ordering quirk so array goldens compare equal:
  * interior fill tiles first (scanline order), then boundary/hash tiles with
  * ids < 2^32-1 in ascending id order followed by larger ids in insertion
  * order (JS integer-index key semantics).
  */
object TileCover {
  import Geom._

  /** Pack x/y/z like tile-cover's toID (dim = 2 * 2^z). */
  def toID(x: Long, y: Long, z: Int): Long = {
    val dim = 2L * (1L << z)
    (dim * y + x) * 32L + z
  }

  def fromID(id: Long): (Int, Int, Int) = {
    val z = (id % 32).toInt
    val dim = 2L * (1L << z)
    val xy = (id - z) / 32
    val x = xy % dim
    val y = ((xy - x) / dim) % dim
    (x.toInt, y.toInt, z)
  }

  /** Covers (x, y) for geometry at zoom; reference order preserved. */
  def cover(geom: Geom, zoom: Int): Vector[(Int, Int)] = {
    // insertion-ordered hash of tile ids
    val tileHash = mutable.LinkedHashSet.empty[Long]
    val tiles = mutable.ArrayBuffer.empty[(Int, Int)]

    geom match {
      case Point((lon, lat)) =>
        val (x, y) = Mercator.pointToTile(lon, lat, zoom)
        return Vector((x, y))
      case MultiPoint(pts) =>
        pts.foreach { case (lon, lat) =>
          val (x, y) = Mercator.pointToTile(lon, lat, zoom)
          tileHash += toID(x, y, zoom)
        }
      case LineString(pts) =>
        lineCover(tileHash, pts, zoom, null)
      case MultiLineString(ls) =>
        ls.foreach(lineCover(tileHash, _, zoom, null))
      case Polygon(rings) =>
        polygonCover(tileHash, tiles, rings, zoom)
      case MultiPolygon(polys) =>
        polys.foreach(polygonCover(tileHash, tiles, _, zoom))
      case Collection(_) =>
        throw new IllegalArgumentException("Geometry type not implemented: GeometryCollection")
    }

    appendHashTiles(tileHash, tiles)
    tiles.toVector
  }

  /** Hash tiles appended as JS Object.keys would order them: integer-index
    * keys (< 2^32-1) ascending, then the rest in insertion order.
    */
  private def appendHashTiles(tileHash: mutable.LinkedHashSet[Long],
                              tiles: mutable.ArrayBuffer[(Int, Int)]): Unit = {
    val limit = 4294967295L // 2^32 - 1
    val (small, big) = tileHash.toVector.partition(_ < limit)
    (small.sorted ++ big).foreach { id =>
      val (x, y, _) = fromID(id)
      tiles += ((x, y))
    }
  }

  /** DDA walk of tile boundaries crossed by a line; mirrors tile-cover
    * lineCover including the cross-segment prevX/prevY carry and the
    * trailing ring-pop when the walk ends on the starting row.
    */
  private def lineCover(tileHash: mutable.LinkedHashSet[Long], coords: Vector[Pt],
                        zoom: Int, ring: mutable.ArrayBuffer[(Long, Long)]): Unit = {
    var prevX = Long.MinValue
    var prevY = Long.MinValue
    var havePrev = false
    var x = 0L
    var y = 0L
    var walked = false

    var i = 0
    while (i < coords.length - 1) {
      val (sx0, sy0) = coords(i)
      val (sx1, sy1) = coords(i + 1)
      val (x0, y0) = Mercator.pointToTileFraction(sx0, sy0, zoom)
      val (x1, y1) = Mercator.pointToTileFraction(sx1, sy1, zoom)
      val dx = x1 - x0
      val dy = y1 - y0
      if (!(dy == 0 && dx == 0)) {
        val sx = if (dx > 0) 1L else -1L
        val sy = if (dy > 0) 1L else -1L
        x = math.floor(x0).toLong
        y = math.floor(y0).toLong
        var tMaxX = if (dx == 0) Double.PositiveInfinity
                    else math.abs(((if (dx > 0) 1 else 0) + x - x0) / dx)
        var tMaxY = if (dy == 0) Double.PositiveInfinity
                    else math.abs(((if (dy > 0) 1 else 0) + y - y0) / dy)
        val tdx = math.abs(sx / dx)
        val tdy = math.abs(sy / dy)
        walked = true

        if (!havePrev || x != prevX || y != prevY) {
          tileHash += toID(x, y, zoom)
          if (ring != null && (!havePrev || y != prevY)) ring += ((x, y))
          prevX = x; prevY = y; havePrev = true
        }
        while (tMaxX < 1 || tMaxY < 1) {
          if (tMaxX < tMaxY) { tMaxX += tdx; x += sx }
          else { tMaxY += tdy; y += sy }
          tileHash += toID(x, y, zoom)
          if (ring != null && y != prevY) ring += ((x, y))
          prevX = x; prevY = y
        }
      }
      i += 1
    }

    if (ring != null && ring.nonEmpty && walked && y == ring(0)._2) {
      ring.remove(ring.length - 1)
    }
  }

  private def polygonCover(tileHash: mutable.LinkedHashSet[Long],
                           tileArray: mutable.ArrayBuffer[(Int, Int)],
                           rings: Vector[Vector[Pt]], zoom: Int): Unit = {
    val intersections = mutable.ArrayBuffer.empty[(Long, Long)]
    rings.foreach { ringCoords =>
      val ring = mutable.ArrayBuffer.empty[(Long, Long)]
      lineCover(tileHash, ringCoords, zoom, ring)
      val len = ring.length
      var j = 0
      var k = len - 1
      while (j < len) {
        val m = (j + 1) % len
        val yj = ring(j)._2
        // y-transition tiles only: not a local extremum, not a duplicate row
        if ((yj > ring(k)._2 || yj > ring(m)._2) &&
          (yj < ring(k)._2 || yj < ring(m)._2) &&
          yj != ring(m)._2) intersections += ring(j)
        k = j
        j += 1
      }
    }

    val sorted = intersections.sortBy(t => (t._2, t._1))
    var i = 0
    while (i + 1 < sorted.length) {
      val y = sorted(i)._2
      var x = sorted(i)._1 + 1
      while (x < sorted(i + 1)._1) {
        if (!tileHash.contains(toID(x, y, zoom))) tileArray += ((x.toInt, y.toInt))
        x += 1
      }
      i += 2
    }
  }

  /** Cover as "z/x/y" strings, the carmen:zxy representation
    * (reference lib/indexer/indexdocs.js:244-263). GeometryCollection is
    * covered per member geometry and concatenated, as the indexer does.
    */
  def zxy(geom: Geom, zoom: Int): Vector[String] = geom match {
    case Collection(gs) => gs.flatMap(g => zxy(g, zoom)).distinct
    case g              => cover(g, zoom).map { case (x, y) => s"$zoom/$x/$y" }
  }
}
