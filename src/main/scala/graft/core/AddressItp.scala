package graft.core

import scala.collection.mutable

/** TIGER-style address-range interpolation — port of the reference
  * lib/geocoder/addressitp.js:36-460 (standardize, forward, reverse,
  * setPoint, getReversePoint, matchSide) including its quirks: JS null
  * coercion in range arithmetic, the last-segment startLine/endLine
  * assignment in getReversePoint, and the first-non-digit-only strip of the
  * queried house number.
  */
object AddressItp {

  /** One GeometryCollection part with its aligned range arrays. Missing
    * entries are empty strings.
    */
  final case class Part(
      lines: Vector[Vector[(Double, Double)]],
      lf: Vector[String] = Vector.empty, lt: Vector[String] = Vector.empty,
      rf: Vector[String] = Vector.empty, rt: Vector[String] = Vector.empty,
      lp: Vector[String] = Vector.empty, rp: Vector[String] = Vector.empty,
      isMultiLineString: Boolean = true)

  final case class ItpPoint(lon: Double, lat: Double, interpolated: Boolean,
                            omitted: Boolean)

  private final case class Range(i: Int, lf: Option[Double], rf: Option[Double],
                                 lt: Option[Double], rt: Option[Double],
                                 lp: String, rp: String,
                                 lines: Vector[(Double, Double)])

  @inline private def semiNum(s: String): Option[Double] =
    if (s == null) None
    else TextNormalize.parseSemiNumber(s).map(_.toDouble)

  @inline private def coerce0(o: Option[Double]): Double = o.getOrElse(0.0)

  /** standardize (addressitp.js:35-67): one Range per line, reverse-pushed
    * then stably sorted.
    */
  private def standardize(part: Part, hasRangeType: Boolean): Vector[Range] = {
    if (!hasRangeType || !part.isMultiLineString) return Vector.empty
    def at(v: Vector[String], i: Int): String = if (i < v.length) v(i) else null
    val ranges = mutable.ArrayBuffer.empty[Range]
    var i = part.lines.length - 1
    while (i >= 0) {
      ranges += Range(i,
        lf = semiNum(at(part.lf, i)), rf = semiNum(at(part.rf, i)),
        lt = semiNum(at(part.lt, i)), rt = semiNum(at(part.rt, i)),
        lp = Option(at(part.lp, i)).getOrElse(""),
        rp = Option(at(part.rp, i)).getOrElse(""),
        lines = part.lines(i))
      i -= 1
    }
    // sortRanges (addressitp.js:76-85); parity fields compare as strings ->
    // NaN in JS -> contribute 0, so they are skipped here
    def n(o: Option[Double]) = o.getOrElse(0.0)
    ranges.toVector.sortWith { (a, b) =>
      val diffs = Seq(n(a.lf) - n(b.lf), n(a.rf) - n(b.rf),
        n(a.lt) - n(b.lt), n(a.rt) - n(b.rt),
        (a.lines.length - b.lines.length).toDouble, (a.i - b.i).toDouble)
      diffs.find(_ != 0.0).exists(_ < 0)
    }
  }

  private def parityAllows(mask: Char, parity: String): Boolean =
    parity == "" || parity == "B" || (mask == 'O' && parity == "O") ||
      (mask == 'E' && parity == "E")

  /** setPoint (addressitp.js:404-440). */
  private def setPoint(address: Double, start0: Double, end0: Double,
                       coords0: Vector[(Double, Double)],
                       omitted: Boolean): ItpPoint = {
    var start = start0
    var end = end0
    var coords = coords0
    if (start > end) { val t = end; end = start; start = t; coords = coords.reverse }
    val part = if (end - start != 0.0) (address - start) / (end - start) else 0.0

    // cumulative euclidean (degree-space) distances per vertex
    val cum = new Array[Double](coords.length)
    var total = 0.0
    var j = 1
    while (j < coords.length) {
      val a = coords(j - 1); val b = coords(j)
      total += StrictMath.sqrt((a._1 - b._1) * (a._1 - b._1) +
        (a._2 - b._2) * (a._2 - b._2))
      cum(j) = total
      j += 1
    }
    val unnorm = part * total
    var stop = 1
    while (stop < coords.length - 1 && cum(stop) <= unnorm) stop += 1
    val range = cum(stop) - cum(stop - 1)
    val interp = if (range != 0.0) (unnorm - cum(stop - 1)) / range else 1.0
    ItpPoint(
      JsNum.jsRound((coords(stop)._1 * interp + coords(stop - 1)._1 * (1 - interp)) * 1e6) / 1e6,
      JsNum.jsRound((coords(stop)._2 * interp + coords(stop - 1)._2 * (1 - interp)) * 1e6) / 1e6,
      interpolated = true, omitted = omitted)
  }

  /** forward (addressitp.js:95-169). */
  def forward(parts: Vector[Part], address0: String,
              hasRangeType: Boolean = true): Option[ItpPoint] = {
    val addressStr = address0.replaceFirst("\\D", "")
    val address = JsNum.jsNumber(addressStr)

    var nearestHn = Double.PositiveInfinity
    var nearestPt: (Double, Double) = null
    var loose: Option[(Double, Double, Vector[(Double, Double)])] = None

    for (part <- parts) {
      val ranges = standardize(part, hasRangeType)
      var i = ranges.length - 1
      while (i >= 0) {
        val f = ranges(i)
        // JS falsy: null or 0 on all four -> skip
        val allFalsy = !f.lf.exists(_ != 0) && !f.rf.exists(_ != 0) &&
          !f.lt.exists(_ != 0) && !f.rt.exists(_ != 0)
        if (!allFalsy) {
          val mask = if (address % 2 == 0) 'E' else 'O'
          val lfN = coerce0(f.lf); val ltN = coerce0(f.lt)
          val rfN = coerce0(f.rf); val rtN = coerce0(f.rt)
          if (f.lf.isDefined && address >= math.min(lfN, ltN) &&
            address <= math.max(lfN, ltN) && parityAllows(mask, f.lp)) {
            return Some(setPoint(address, lfN, ltN, f.lines, omitted = false))
          } else if (f.rf.isDefined && address >= math.min(rfN, rtN) &&
            address <= math.max(rfN, rtN) && parityAllows(mask, f.rp)) {
            return Some(setPoint(address, rfN, rtN, f.lines, omitted = false))
          } else if (f.lf.isDefined && address >= math.min(lfN, ltN) &&
            address <= math.max(lfN, ltN)) {
            loose = Some((lfN, ltN, f.lines))
          } else if (f.rf.isDefined && address >= math.min(rfN, rtN) &&
            address <= math.max(rfN, rtN)) {
            loose = Some((rfN, rtN, f.lines))
          } else {
            val hns = Array(f.lf, f.lt, f.rf, f.rt)
            var j2 = 0
            while (j2 < 4) {
              hns(j2) match {
                case Some(hn) =>
                  // NaN comparisons are false, matching the JS skip logic
                  if (!(math.abs(address - nearestHn) < math.abs(address - hn))) {
                    nearestHn = hn
                    nearestPt = if (j2 % 2 == 0) f.lines(0) else f.lines(1)
                  }
                case None =>
              }
              j2 += 1
            }
          }
        }
        i -= 1
      }
    }

    loose match {
      case Some((from, to, line)) => Some(setPoint(address, from, to, line, omitted = true))
      case None =>
        if (math.abs(address - nearestHn) <= 400)
          Some(setPoint(address, nearestHn, nearestHn,
            Vector(nearestPt, nearestPt), omitted = true))
        else None
    }
  }

  // ---- turf-equivalent geodesy (public turf formulas, miles) ------------

  private val EarthRadius = 6371008.8
  private val MilesFactor = EarthRadius / 1609.344
  private val D2R = math.Pi / 180
  private val R2D = 180 / math.Pi

  private def distMiles(a: (Double, Double), b: (Double, Double)): Double = {
    val dLat = D2R * (b._2 - a._2); val dLon = D2R * (b._1 - a._1)
    val lat1 = D2R * a._2; val lat2 = D2R * b._2
    val h = StrictMath.pow(StrictMath.sin(dLat / 2), 2) +
      StrictMath.pow(StrictMath.sin(dLon / 2), 2) * StrictMath.cos(lat1) * StrictMath.cos(lat2)
    2 * StrictMath.atan2(StrictMath.sqrt(h), StrictMath.sqrt(1 - h)) * MilesFactor
  }

  private def bearingDeg(a: (Double, Double), b: (Double, Double)): Double = {
    val lon1 = D2R * a._1; val lon2 = D2R * b._1
    val lat1 = D2R * a._2; val lat2 = D2R * b._2
    val y = StrictMath.sin(lon2 - lon1) * StrictMath.cos(lat2)
    val x = StrictMath.cos(lat1) * StrictMath.sin(lat2) -
      StrictMath.sin(lat1) * StrictMath.cos(lat2) * StrictMath.cos(lon2 - lon1)
    R2D * StrictMath.atan2(y, x)
  }

  private def destinationMiles(origin: (Double, Double), dist: Double,
                               bearing: Double): (Double, Double) = {
    val lon1 = D2R * origin._1; val lat1 = D2R * origin._2
    val brng = D2R * bearing
    val radians = dist / MilesFactor
    val lat2 = StrictMath.asin(StrictMath.sin(lat1) * StrictMath.cos(radians) +
      StrictMath.cos(lat1) * StrictMath.sin(radians) * StrictMath.cos(brng))
    val lon2 = lon1 + StrictMath.atan2(
      StrictMath.sin(brng) * StrictMath.sin(radians) * StrictMath.cos(lat1),
      StrictMath.cos(radians) - StrictMath.sin(lat1) * StrictMath.sin(lat2))
    (R2D * lon2, R2D * lat2)
  }

  /** lineIntersects (addressitp.js:352-395): strict segment-segment. */
  private def lineIntersects(l1s: (Double, Double), l1e: (Double, Double),
                             l2s: (Double, Double), l2e: (Double, Double)): Option[(Double, Double)] = {
    val denominator = (l2e._2 - l2s._2) * (l1e._1 - l1s._1) -
      (l2e._1 - l2s._1) * (l1e._2 - l1s._2)
    if (denominator == 0) return None
    val diffY = l1s._2 - l2s._2
    val diffX = l1s._1 - l2s._1
    val a = ((l2e._1 - l2s._1) * diffY - (l2e._2 - l2s._2) * diffX) / denominator
    val b = ((l1e._1 - l1s._1) * diffY - (l1e._2 - l1s._2) * diffX) / denominator
    if (a > 0 && a < 1 && b > 0 && b < 1)
      Some((l1s._1 + a * (l1e._1 - l1s._1), l1s._2 + a * (l1e._2 - l1s._2)))
    else None
  }

  private final case class RevPoint(dist: Double, travelled: Double,
                                    pt: (Double, Double), lineDist: Double,
                                    startLine: (Double, Double),
                                    endLine: (Double, Double))

  /** getReversePoint (addressitp.js:282-349). Faithful to the reference:
    * startLine/endLine come from the LAST segment index (the index property
    * is overwritten each iteration in the JS).
    */
  private def getReversePoint(pt: (Double, Double),
                              coords: Vector[(Double, Double)]): RevPoint = {
    var closestDist = Double.PositiveInfinity
    var closestPt: (Double, Double) = (Double.PositiveInfinity, Double.PositiveInfinity)
    var closestTravelled = 0.0
    var travelled = 0.0
    var lineDist = 0.0
    var i = 0
    while (i < coords.length - 1) {
      val start = coords(i); val stop = coords(i + 1)
      val dStart = distMiles(pt, start)
      val dStop = distMiles(pt, stop)
      val direction = bearingDeg(start, stop)
      var perp = destinationMiles(pt, 1000, direction + 90)
      var intersect = lineIntersects(pt, perp, start, stop)
      if (intersect.isEmpty) {
        perp = destinationMiles(pt, 1000, direction - 90)
        intersect = lineIntersects(pt, perp, start, stop)
      }
      if (dStart < closestDist) {
        closestDist = dStart; closestPt = start; closestTravelled = travelled
      }
      if (dStop < closestDist) {
        closestDist = dStop; closestPt = stop
        closestTravelled = travelled + distMiles(start, stop)
      }
      intersect.foreach { ipt =>
        val dI = distMiles(pt, ipt)
        if (dI < closestDist) {
          closestDist = dI; closestPt = ipt
          closestTravelled = travelled + distMiles(start, ipt)
        }
      }
      travelled += distMiles(start, stop)
      i += 1
    }
    var j = 1
    while (j < coords.length) { lineDist += distMiles(coords(j - 1), coords(j)); j += 1 }
    RevPoint(closestDist, closestTravelled, closestPt, lineDist,
      coords(coords.length - 2), coords(coords.length - 1))
  }

  @inline private def det2D(s: (Double, Double), e: (Double, Double),
                            q: (Double, Double)): Double =
    (e._1 - s._1) * (q._2 - s._2) - (e._2 - s._2) * (q._1 - s._1)

  @inline private def signOf(n: Double): Int =
    if (n < 0) -1 else if (n > 0) 1 else 0

  /** matchSide (addressitp.js:241-269). NaN result = no address. */
  private def matchSide(range: Range, left: Boolean, point: RevPoint,
                        strict: Boolean = false): Double = {
    val (parity, from, to) =
      if (left) (range.lp, range.lf, range.lt) else (range.rp, range.rf, range.rt)
    if (parity.isEmpty && !strict) return matchSide(range, !left, point, strict = true)
    if (parity.isEmpty && strict) return Double.NaN
    val distRatio = point.travelled / point.lineDist
    val f = from.getOrElse(Double.NaN)
    val t = to.getOrElse(Double.NaN)
    val num = f + (t - f) * distRatio
    parity match {
      case "O" => JsNum.jsRound((num + 1) / 2) * 2 - 1
      case "E" => JsNum.jsRound(num / 2) * 2
      case _ => JsNum.jsRound(num)
    }
  }

  /** reverse (addressitp.js:177-231): snap to the nearest range line,
    * interpolate the house number for the query's side of the street.
    * Returns (addressNumber if truthy, snapped point).
    */
  def reverse(parts: Vector[Part], lon: Double, lat: Double,
              hasRangeType: Boolean = true): Option[(Option[Long], Double, Double)] = {
    if (!hasRangeType) return None
    val query = (lon, lat)
    var potential: RevPoint = null
    var potentialRange: Range = null
    for (part <- parts if part.isMultiLineString) {
      val ranges = standardize(part, hasRangeType)
      var i = ranges.length - 1
      while (i >= 0) {
        val current = getReversePoint(query, ranges(i).lines)
        if (potential == null || current.dist < potential.dist) {
          potential = current
          potentialRange = ranges(i)
        }
        i -= 1
      }
    }
    if (potential == null) return None

    val sideBinary = signOf(det2D(potential.startLine, potential.endLine, query))
    val mid = ((potential.startLine._1 + potential.endLine._1) / 2,
      (potential.startLine._2 + potential.endLine._2) / 2)
    val leftProbe = destinationMiles(mid, 0.01,
      bearingDeg(potential.startLine, potential.endLine) - 90)
    val leftSideBinary = signOf(det2D(potential.startLine, potential.endLine, leftProbe))

    val num = matchSide(potentialRange, left = sideBinary == leftSideBinary, potential)
    val addr = if (num.isNaN || num == 0.0) None else Some(num.toLong)
    Some((addr, potential.pt._1, potential.pt._2))
  }
}
