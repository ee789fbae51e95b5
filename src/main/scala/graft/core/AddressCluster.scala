package graft.core

import scala.collection.mutable

/** Address-cluster resolution — port of the reference
  * lib/geocoder/addresscluster.js:61-420 (forward, forwardPrefix,
  * forwardPrefixFiltered, reverse, standard + queens address styles).
  *
  * A cluster feature is a GeometryCollection whose parts align with
  * carmen:addressnumber: part k's numbers[i] corresponds to coords[i] of the
  * k-th MultiPoint.
  */
object AddressCluster {

  /** One GeometryCollection part: numbers aligned with coordinates.
    * `isMultiPoint` false marks non-MultiPoint parts (skipped on match).
    */
  final case class Part(numbers: Vector[String], coords: Vector[(Double, Double)],
                        isMultiPoint: Boolean = true)

  final case class Matched(lon: Double, lat: Double, number: String, addressIdx: Int)
  final case class PrefixPoint(idx: Int, number: String, numberAsInt: Double,
                               lon: Double, lat: Double)

  private def round6(v: Double): Double = JsNum.jsRound(v * 1e6) / 1e6

  // ---- match strings (addresscluster.js:309-359) -----------------------

  // The match-string kernels run once per (query, feature-number) pair in
  // forward/forwardPrefix — clusters carry hundreds of numbers, so the
  // original regex forms (Matcher + StringBuffer per call) were a measured
  // allocation hot spot. These scans are exact re-expressions; the no-hit
  // paths (pure-digit house numbers, the common case) return the input
  // reference unchanged and allocate nothing.

  private final case class StdStrings(raw: String, numeric: String, initial: String)
  private final case class QueensStrings(raw: String, hyphenated: String,
                                         numeric: String, containsHyphen: Boolean)

  @inline private def isDigitAscii(c: Char): Boolean = c >= '0' && c <= '9'

  /** `"[^\\d]".r.replaceFirstIn(s, "")` (or `[^\d-]` with `allowDash`):
    * drop the first char outside the class; no-hit returns `s` itself.
    */
  private[core] def dropFirstNonDigit(s: String, allowDash: Boolean): String = {
    var i = 0
    while (i < s.length &&
      (isDigitAscii(s.charAt(i)) || (allowDash && s.charAt(i) == '-'))) i += 1
    if (i == s.length) s
    else new java.lang.StringBuilder(s.length - 1)
      .append(s, 0, i).append(s, i + 1, s.length).toString
  }

  /** Full-match `^(\d+)([^\d].*)` group 1, else the input: needs >= 1
    * leading digit, a following non-digit char, and — because `.` does not
    * match '\n' — no newline after that char.
    */
  private[core] def initialOf(s: String): String = {
    var i = 0
    while (i < s.length && isDigitAscii(s.charAt(i))) i += 1
    if (i >= 1 && i < s.length && s.indexOf('\n', i + 1) < 0) s.substring(0, i)
    else s
  }

  private def stdStrings(address: String): StdStrings = StdStrings(
    raw = address.toLowerCase(java.util.Locale.ROOT),
    numeric = dropFirstNonDigit(address, allowDash = false),
    initial = initialOf(address))

  private def queensStrings(address: String): QueensStrings = QueensStrings(
    raw = address.toLowerCase(java.util.Locale.ROOT),
    hyphenated = dropFirstNonDigit(address, allowDash = true),
    numeric = dropFirstNonDigit(address, allowDash = false),
    containsHyphen = address.contains('-'))

  /** Rank of a match between query and feature number in the given style:
    * -1 = no match; lower is better (addresscluster.js:384-420).
    */
  private def rankQueens(q: QueensStrings, feature: String,
                         prefixMatch: Boolean): Int = {
    val f = queensStrings(feature)
    if (prefixMatch) {
      if (f.raw.startsWith(q.raw)) 0
      else if (f.hyphenated.startsWith(q.hyphenated)) 1
      else if (f.numeric.startsWith(q.numeric) && !q.containsHyphen) 2
      else -1
    } else {
      if (f.raw == q.raw) 0
      else if (f.hyphenated == q.hyphenated) 1
      else if (f.numeric == q.numeric && !q.containsHyphen) 2
      else -1
    }
  }

  private def rankStd(q: StdStrings, feature: String,
                      prefixMatch: Boolean): Int = {
    val f = stdStrings(feature)
    if (prefixMatch) {
      if (f.raw.startsWith(q.raw)) 0
      else if (f.raw.startsWith(q.numeric)) 1
      else -1
    } else {
      if (f.raw == q.raw) 0
      else if (f.raw == q.numeric) 1
      else if (f.initial.nonEmpty && f.initial == q.initial) 2
      else -1
    }
  }

  /** Per-feature rank function with the query-side strings computed ONCE
    * (they were rebuilt per feature number before — pure waste inside the
    * per-number loops below).
    */
  private def rankFn(style: String, query: String,
                     prefixMatch: Boolean): String => Int =
    if (style == "queens") {
      val q = queensStrings(query)
      f => rankQueens(q, f, prefixMatch)
    } else {
      val q = stdStrings(query)
      f => rankStd(q, f, prefixMatch)
    }

  /** forward (addresscluster.js:61-116): exact match against the cluster,
    * best rank wins, capped at `num` points (rounded to 1e-6).
    */
  def forward(parts: Vector[Part], address: String, num: Int = 10,
              style: String = "standard"): Vector[Matched] = {
    val matched = mutable.ArrayBuffer.empty[Matched]
    var matchQuality = Int.MaxValue
    val rk = rankFn(style, address, prefixMatch = false)
    for (part <- parts) {
      var i = 0
      while (i < part.numbers.length) {
        val r = rk(part.numbers(i))
        if (r != -1 && part.isMultiPoint) {
          if (r < matchQuality) {
            matchQuality = r
            matched.clear()
            matched += mk(part, i)
          } else if (r == matchQuality && matched.length >= num) {
            if (matchQuality == 0) return matched.toVector
            // else skip in hopes of finding better
          } else if (r == matchQuality) {
            matched += mk(part, i)
          }
        }
        i += 1
      }
    }
    matched.toVector
  }

  private def mk(part: Part, i: Int): Matched =
    Matched(round6(part.coords(i)._1), round6(part.coords(i)._2),
      part.numbers(i), i)

  /** forwardPrefix (addresscluster.js:126-172): prefix match, best rank. */
  def forwardPrefix(parts: Vector[Part], address: String,
                    style: String = "standard"): Vector[PrefixPoint] = {
    val matched = mutable.ArrayBuffer.empty[PrefixPoint]
    var matchQuality = Int.MaxValue
    val rk = rankFn(style, address, prefixMatch = true)
    for (part <- parts) {
      var i = 0
      while (i < part.numbers.length) {
        val r = rk(part.numbers(i))
        if (r != -1 && part.isMultiPoint) {
          if (r < matchQuality) {
            matchQuality = r
            matched.clear()
          }
          if (r <= matchQuality) {
            val n = part.numbers(i)
            matched += PrefixPoint(i, n, JsNum.parseIntPrefix(n),
              part.coords(i)._1, part.coords(i)._2)
          }
        }
        i += 1
      }
    }
    matched.toVector
  }

  /** forwardPrefixFiltered (addresscluster.js:185-221): sort candidates by
    * number, probe first/last/middle by distance to the proximity point,
    * return the closest. distanceFn mirrors proximity.distance semantics.
    */
  def forwardPrefixFiltered(parts: Vector[Part], address: String,
                            distanceFn: (Double, Double) => Double,
                            style: String = "standard"): Option[(PrefixPoint, Double)] = {
    val pts = forwardPrefix(parts, address, style)
    if (pts.isEmpty) return None
    val sorted = pts.sortBy(_.numberAsInt)
    val fml = mutable.ArrayBuffer(sorted.head)
    if (sorted.length > 1) {
      fml += sorted.last
      if (sorted.length > 2) fml += sorted(sorted.length >> 1)
    }
    val withDist = fml.map(p => (p, distanceFn(p.lon, p.lat)))
    Some(withDist.minBy(_._2))
  }

  /** reverse (addresscluster.js:228-273): nearest cluster point by the
    * reference's (faithfully ported, slightly nonstandard) haversine variant.
    */
  def reverse(parts: Vector[Part], lon: Double, lat: Double): Option[Matched] = {
    var closest: Option[(Int, Int, Double)] = None // (part, pos, dist)
    var pIdx = 0
    for (part <- parts) {
      // non-MultiPoint parts produce NaN distances in the reference and are
      // never selected; skipping them is equivalent
      var l = (if (part.isMultiPoint) math.min(part.numbers.length, part.coords.length) else 0) - 1
      while (l >= 0) {
        val (lon2, lat2) = part.coords(l)
        val phi1 = lat * (math.Pi / 180)
        val phi2 = lat2 * (math.Pi / 180)
        val dPhi = (lat2 - lat) * (math.Pi / 180)
        val dLam = (lon2 - lon) * (math.Pi / 180)
        val s1 = StrictMath.sin(dPhi / 2) * StrictMath.sin(dPhi / 2)
        val s2 = StrictMath.cos(phi1) * StrictMath.cos(phi2) *
          StrictMath.sin(dLam / 2) * StrictMath.sin(dLam / 2)
        // the reference's second sqrt term is (1 - s1 + s2), not (1 - (s1+s2))
        val dist = 6371 * 2 * StrictMath.atan2(
          StrictMath.sqrt(s1 + s2), StrictMath.sqrt(1 - s1 + s2))
        if (closest.forall(_._3 > dist)) closest = Some((pIdx, l, dist))
        l -= 1
      }
      pIdx += 1
    }
    closest.map { case (pi, pos, _) =>
      val part = parts(pi)
      Matched(part.coords(pos)._1, part.coords(pos)._2, part.numbers(pos), pos)
    }
  }
}
