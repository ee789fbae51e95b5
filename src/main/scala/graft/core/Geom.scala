package graft.core

/** Minimal GeoJSON geometry model used throughout the engine.
  *
  * Coordinates are (lon, lat) pairs. Matches the geometry types the
  * reference accepts (reference docs/data-sources.md:54-168).
  */
sealed trait Geom {
  def typeName: String
}

object Geom {
  type Pt = (Double, Double)

  final case class Point(pt: Pt) extends Geom { def typeName = "Point" }
  final case class MultiPoint(pts: Vector[Pt]) extends Geom { def typeName = "MultiPoint" }
  final case class LineString(pts: Vector[Pt]) extends Geom { def typeName = "LineString" }
  final case class MultiLineString(lines: Vector[Vector[Pt]]) extends Geom { def typeName = "MultiLineString" }
  final case class Polygon(rings: Vector[Vector[Pt]]) extends Geom { def typeName = "Polygon" }
  final case class MultiPolygon(polys: Vector[Vector[Vector[Pt]]]) extends Geom { def typeName = "MultiPolygon" }
  final case class Collection(geoms: Vector[Geom]) extends Geom { def typeName = "GeometryCollection" }

  // --- GeoJSON (de)serialization via Jackson (ships with Spark) ---
  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
  import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
  import scala.jdk.CollectionConverters._

  private val mapper = new ObjectMapper()

  private def parsePt(n: JsonNode): Pt = (n.get(0).asDouble(), n.get(1).asDouble())
  private def parsePts(n: JsonNode): Vector[Pt] = n.elements().asScala.map(parsePt).toVector
  private def parseLines(n: JsonNode): Vector[Vector[Pt]] =
    n.elements().asScala.map(parsePts).toVector

  def fromJsonNode(node: JsonNode): Geom = node.get("type").asText() match {
    case "Point"           => Point(parsePt(node.get("coordinates")))
    case "MultiPoint"      => MultiPoint(parsePts(node.get("coordinates")))
    case "LineString"      => LineString(parsePts(node.get("coordinates")))
    case "MultiLineString" => MultiLineString(parseLines(node.get("coordinates")))
    case "Polygon"         => Polygon(parseLines(node.get("coordinates")))
    case "MultiPolygon" =>
      MultiPolygon(node.get("coordinates").elements().asScala.map(parseLines).toVector)
    case "GeometryCollection" =>
      Collection(node.get("geometries").elements().asScala.map(fromJsonNode).toVector)
    case t => throw new IllegalArgumentException(s"Geometry type not implemented: $t")
  }

  def fromJson(json: String): Geom = fromJsonNode(mapper.readTree(json))

  private def ptNode(p: Pt): ArrayNode = {
    val a = mapper.createArrayNode(); a.add(p._1); a.add(p._2); a
  }
  private def ptsNode(ps: Vector[Pt]): ArrayNode = {
    val a = mapper.createArrayNode(); ps.foreach(p => a.add(ptNode(p))); a
  }
  private def linesNode(ls: Vector[Vector[Pt]]): ArrayNode = {
    val a = mapper.createArrayNode(); ls.foreach(l => a.add(ptsNode(l))); a
  }

  def toJsonNode(g: Geom): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("type", g.typeName)
    g match {
      case Point(p)            => o.set[ObjectNode]("coordinates", ptNode(p))
      case MultiPoint(ps)      => o.set[ObjectNode]("coordinates", ptsNode(ps))
      case LineString(ps)      => o.set[ObjectNode]("coordinates", ptsNode(ps))
      case MultiLineString(ls) => o.set[ObjectNode]("coordinates", linesNode(ls))
      case Polygon(rs)         => o.set[ObjectNode]("coordinates", linesNode(rs))
      case MultiPolygon(ps) =>
        val a = mapper.createArrayNode(); ps.foreach(p => a.add(linesNode(p)))
        o.set[ObjectNode]("coordinates", a)
      case Collection(gs) =>
        val a = mapper.createArrayNode(); gs.foreach(g2 => a.add(toJsonNode(g2)))
        o.set[ObjectNode]("geometries", a)
    }
    o
  }

  def toJson(g: Geom): String = mapper.writeValueAsString(toJsonNode(g))

  // --- compact binary codec (WKB-style, engine-internal) ---
  //
  // tile_features/features store geometry in this form so the reverse/context
  // hot joins never parse JSON per candidate row: decode is a single
  // ByteBuffer sweep into primitive arrays (~20x cheaper than Jackson).
  // Layout (big-endian): tag byte, then counts (int32) + coords (2 float64
  // per position), nested per type; GeometryCollection recurses.

  private def writeBin(g: Geom, out: java.io.DataOutputStream): Unit = {
    def pts(ps: Vector[Pt]): Unit = {
      out.writeInt(ps.length)
      ps.foreach { case (x, y) => out.writeDouble(x); out.writeDouble(y) }
    }
    def lines(ls: Vector[Vector[Pt]]): Unit = {
      out.writeInt(ls.length); ls.foreach(pts)
    }
    g match {
      case Point((x, y))       => out.writeByte(1); out.writeDouble(x); out.writeDouble(y)
      case MultiPoint(ps)      => out.writeByte(2); pts(ps)
      case LineString(ps)      => out.writeByte(3); pts(ps)
      case MultiLineString(ls) => out.writeByte(4); lines(ls)
      case Polygon(rs)         => out.writeByte(5); lines(rs)
      case MultiPolygon(ps)    => out.writeByte(6); out.writeInt(ps.length); ps.foreach(lines)
      case Collection(gs)      => out.writeByte(7); out.writeInt(gs.length)
        gs.foreach(writeBin(_, out))
    }
  }

  def toBin(g: Geom): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(64)
    val out = new java.io.DataOutputStream(bos)
    writeBin(g, out)
    out.flush()
    bos.toByteArray
  }

  private def readBin(buf: java.nio.ByteBuffer): Geom = {
    def pts(): Vector[Pt] = {
      val n = buf.getInt
      val b = Vector.newBuilder[Pt]; b.sizeHint(n)
      var i = 0
      while (i < n) { b += ((buf.getDouble, buf.getDouble)); i += 1 }
      b.result()
    }
    def lines(): Vector[Vector[Pt]] = {
      val n = buf.getInt
      val b = Vector.newBuilder[Vector[Pt]]; b.sizeHint(n)
      var i = 0
      while (i < n) { b += pts(); i += 1 }
      b.result()
    }
    buf.get() match {
      case 1 => Point((buf.getDouble, buf.getDouble))
      case 2 => MultiPoint(pts())
      case 3 => LineString(pts())
      case 4 => MultiLineString(lines())
      case 5 => Polygon(lines())
      case 6 =>
        val n = buf.getInt
        val b = Vector.newBuilder[Vector[Vector[Pt]]]; b.sizeHint(n)
        var i = 0
        while (i < n) { b += lines(); i += 1 }
        MultiPolygon(b.result())
      case 7 =>
        val n = buf.getInt
        val b = Vector.newBuilder[Geom]; b.sizeHint(n)
        var i = 0
        while (i < n) { b += readBin(buf); i += 1 }
        Collection(b.result())
      case t => throw new IllegalArgumentException(s"bad geom tag: $t")
    }
  }

  def fromBin(bytes: Array[Byte]): Geom = readBin(java.nio.ByteBuffer.wrap(bytes))

  /** All positions of a geometry, flattened. */
  def allPoints(g: Geom): Vector[Pt] = g match {
    case Point(p)            => Vector(p)
    case MultiPoint(ps)      => ps
    case LineString(ps)      => ps
    case MultiLineString(ls) => ls.flatten
    case Polygon(rs)         => rs.flatten
    case MultiPolygon(ps)    => ps.flatten.flatten
    case Collection(gs)      => gs.flatMap(allPoints)
  }

  /** Ray-casting point-in-polygon over a single polygon's rings
    * (even-odd rule; on-edge behavior matches the classic algorithm).
    */
  def pipRaycast(rings: Vector[Vector[Pt]], lon: Double, lat: Double): Boolean = {
    var inside = false
    var r = 0
    while (r < rings.length) {
      val ring = rings(r)
      var i = 0
      var j = ring.length - 1
      var ringInside = false
      while (i < ring.length) {
        val (xi, yi) = ring(i)
        val (xj, yj) = ring(j)
        if (((yi > lat) != (yj > lat)) &&
          (lon < (xj - xi) * (lat - yi) / (yj - yi) + xi)) ringInside = !ringInside
        j = i
        i += 1
      }
      if (r == 0) inside = ringInside               // outer ring
      else if (ringInside) inside = !inside         // holes toggle
      r += 1
    }
    inside
  }

  /** A point exactly on a ring edge or vertex counts as contained: vector
    * tiles snap geometry to integer tile units, so vtquery's direct-hit
    * test is boundary-inclusive — observable in the reference acceptance
    * fixtures whose carmen:center sits on a tile-box corner
    * (e.g. geocode-unit.stacky.test.js center [0,0] on tile 6/32/32).
    */
  private def onRingEdge(rings: Vector[Vector[Pt]], lon: Double,
                         lat: Double): Boolean = {
    val eps2 = 1e-18
    var r = 0
    while (r < rings.length) {
      val ring = rings(r)
      var i = 0
      while (i < ring.length - 1) {
        val (ax, ay) = ring(i)
        val (bx, by) = ring(i + 1)
        if (nearestOnSegment(lon, lat, ax, ay, bx, by)._3 <= eps2) return true
        i += 1
      }
      r += 1
    }
    false
  }

  def contains(g: Geom, lon: Double, lat: Double): Boolean = g match {
    case Polygon(rs)      => pipRaycast(rs, lon, lat) || onRingEdge(rs, lon, lat)
    case MultiPolygon(ps) => ps.exists(p => pipRaycast(p, lon, lat) || onRingEdge(p, lon, lat))
    case Collection(gs)   => gs.exists(contains(_, lon, lat))
    case _                => false
  }

  /** Squared planar distance from a point to a segment, plus nearest point —
    * used by nearest-point-on-line (reference lib/geocoder/routablepoint.js).
    */
  def nearestOnSegment(px: Double, py: Double, ax: Double, ay: Double,
                       bx: Double, by: Double): (Double, Double, Double) = {
    val dx = bx - ax
    val dy = by - ay
    val len2 = dx * dx + dy * dy
    val t =
      if (len2 == 0) 0.0
      else math.max(0.0, math.min(1.0, ((px - ax) * dx + (py - ay) * dy) / len2))
    val nx = ax + t * dx
    val ny = ay + t * dy
    val ddx = px - nx
    val ddy = py - ny
    (nx, ny, ddx * ddx + ddy * ddy)
  }

  /** Nearest point on a (Multi)LineString to the given point (planar lon/lat
    * space, matching the reference's use of turf point-on-line semantics for
    * routable points at small scales).
    */
  def nearestPointOnLine(g: Geom, lon: Double, lat: Double): Option[Pt] = {
    val lines: Vector[Vector[Pt]] = g match {
      case LineString(ps)      => Vector(ps)
      case MultiLineString(ls) => ls
      case Collection(gs)      => gs.flatMap(nearestLines)
      case _                   => Vector.empty
    }
    // Candidate ranking is equirectangular (longitude offsets scaled by
    // cos(lat)) because the reference ranks per-segment planar projections
    // by spherical distance (turf nearestPointOnLine): with two near-
    // equidistant segments, an east-west gap counts slightly less than the
    // same north-south gap (routablepoint.test.js cul-de-sac fixtures).
    // The per-segment projection itself stays planar, also matching turf.
    val cosLat = math.cos(math.toRadians(lat))
    var best: Option[(Double, Pt)] = None
    lines.foreach { line =>
      var i = 0
      while (i < line.length - 1) {
        val (ax, ay) = line(i)
        val (bx, by) = line(i + 1)
        val (nx, ny, _) = nearestOnSegment(lon, lat, ax, ay, bx, by)
        val ddx = (nx - lon) * cosLat
        val ddy = ny - lat
        val d2 = ddx * ddx + ddy * ddy
        if (best.isEmpty || d2 < best.get._1) best = Some((d2, (nx, ny)))
        i += 1
      }
    }
    best.map(_._2)
  }

  private def nearestLines(g: Geom): Vector[Vector[Pt]] = g match {
    case LineString(ps)      => Vector(ps)
    case MultiLineString(ls) => ls
    case _                   => Vector.empty
  }

  /** Approximate great-circle distance (miles) from a point to a geometry:
    * 0 inside polygons; nearest point on segments for lines; nearest vertex
    * otherwise — the role vtquery's tile-space distance plays in the
    * reference (lib/geocoder/context.js:576-631).
    */
  def distanceMiles(g: Geom, lon: Double, lat: Double): Double = g match {
    case Point((x, y))  => Mercator.haversineMiles(lon, lat, x, y)
    case MultiPoint(ps) =>
      ps.map { case (x, y) => Mercator.haversineMiles(lon, lat, x, y) }.min
    case LineString(_) | MultiLineString(_) =>
      nearestPointOnLine(g, lon, lat)
        .map { case (x, y) => Mercator.haversineMiles(lon, lat, x, y) }
        .getOrElse(Double.MaxValue)
    case Polygon(rs) =>
      if (pipRaycast(rs, lon, lat) || onRingEdge(rs, lon, lat)) 0.0
      else rs.flatten.map { case (x, y) => Mercator.haversineMiles(lon, lat, x, y) }.min
    case MultiPolygon(ps) => ps.map(p => distanceMiles(Polygon(p), lon, lat)).min
    case Collection(gs)   => gs.map(distanceMiles(_, lon, lat)).min
  }

  /** Bounding box [w, s, e, n]. */
  def bbox(g: Geom): (Double, Double, Double, Double) = {
    val pts = allPoints(g)
    var w = Double.MaxValue; var s = Double.MaxValue
    var e = -Double.MaxValue; var n = -Double.MaxValue
    pts.foreach { case (x, y) =>
      if (x < w) w = x; if (x > e) e = x
      if (y < s) s = y; if (y > n) n = y
    }
    (w, s, e, n)
  }
}
