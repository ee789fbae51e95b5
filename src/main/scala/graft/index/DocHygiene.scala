package graft.index

import graft.core.{Geom, Mercator, TextNormalize}
import graft.model.GeoDoc

/** Index-time document hygiene — ports of the reference's standardize
  * pipeline (reference lib/indexer/indexdocs.js:164-360, 485-601):
  * validation (I1), polygon rewind (I2), cover cap (I4), interpolation
  * outlier clamp (I5), center verification (I6).
  */
object DocHygiene {

  val MaxCovers = 10000          // indexdocs.js:342
  val MaxTextSynonyms = 10       // reference lib/constants.js MAX_TEXT_SYNONYMS
  val MaxVertices = 50000        // indexdocs.js polygon vertex cap

  /** I1 runChecks subset (indexdocs.js:164-218): None = valid. */
  def validate(doc: GeoDoc): Option[String] = {
    if (doc.id == 0) return Some(s"doc has no id")
    if (doc.geometry == null || doc.geometry.isEmpty)
      return Some(s"doc has no geometry on id: ${doc.id}")
    if (doc.text == null || doc.text.isEmpty)
      return Some(s"doc has no carmen:text on id:${doc.id}")
    val synonyms = doc.text.split(",", -1).length
    val hasAddressData = doc.addressnumber.nonEmpty || doc.rangetype.nonEmpty ||
      doc.intersections.nonEmpty
    if (synonyms > MaxTextSynonyms && hasAddressData)
      return Some(s"doc's carmen:text on id:${doc.id} has more than the allowed $MaxTextSynonyms synonyms")
    val geom = try Geom.fromJson(doc.geometry) catch {
      case e: Exception => return Some(s"invalid geometry on id:${doc.id}: ${e.getMessage}")
    }
    val vertices = geom match {
      case Geom.Polygon(rings) => rings.map(_.length).sum
      case Geom.MultiPolygon(polys) => polys.flatMap(_.map(_.length)).sum
      case _ => 0
    }
    if (vertices > MaxVertices)
      return Some(s"doc's polygon on id:${doc.id} has $vertices vertices, exceeding $MaxVertices")
    // carmen:text_{lang} keys must be valid language codes
    // (reference termops.js:400-404)
    for (code <- doc.langTexts.keys) {
      val lang = code.replace("-", "_")
      if (lang != "universal" && !graft.core.ClosestLang.hasLanguage(lang))
        return Some(s"$code is an invalid language code")
    }
    None
  }

  // ---- I2 polygon rewind (RFC 7946: exterior CCW, holes CW) -------------

  private def ringArea(ring: Vector[(Double, Double)]): Double = {
    var area = 0.0
    var i = 0
    while (i < ring.length - 1) {
      area += (ring(i + 1)._1 - ring(i)._1) * (ring(i + 1)._2 + ring(i)._2)
      i += 1
    }
    area
  }

  private def rewindRing(ring: Vector[(Double, Double)], outer: Boolean): Vector[(Double, Double)] = {
    // shoelace sign: negative area (as computed above) = counterclockwise
    val ccw = ringArea(ring) < 0
    if (ccw == outer) ring else ring.reverse
  }

  /** I2: enforce exterior-CCW/holes-CW winding on (Multi)Polygons. */
  def rewind(geom: Geom): Geom = geom match {
    case Geom.Polygon(rings) =>
      Geom.Polygon(rings.zipWithIndex.map { case (r, i) => rewindRing(r, i == 0) })
    case Geom.MultiPolygon(polys) =>
      Geom.MultiPolygon(polys.map(rings =>
        rings.zipWithIndex.map { case (r, i) => rewindRing(r, i == 0) }))
    case Geom.Collection(gs) => Geom.Collection(gs.map(rewind))
    case g => g
  }

  // ---- I4 cover cap (indexdocs.js:342-358) ------------------------------

  /** Cap covers at [[MaxCovers]], keeping those closest to the center. */
  def capCovers(zxy: Seq[String], centerLon: Double, centerLat: Double,
                zoom: Int): Seq[String] = {
    if (zxy.length <= MaxCovers) return zxy
    val (cx, cy) = Mercator.px(centerLon, centerLat, zoom)
    val ctx = cx / Mercator.TileSize
    val cty = cy / Mercator.TileSize
    zxy.sortBy { s =>
      val p = s.split("/")
      val dx = ctx - p(1).toInt
      val dy = cty - p(2).toInt
      math.sqrt(dx * dx + dy * dy)
    }.take(MaxCovers)
  }

  // ---- I5 interpolation outlier clamp (indexdocs.js:549-601) ------------

  /** percentile over a sorted array (indexdocs.js:588-601). */
  def percentile(arr: Vector[Double], p: Double): Double = {
    if (arr.isEmpty) return 0
    if (p <= 0) return arr.head
    if (p >= 1) return arr.last
    val index = (arr.length - 1) * p
    val lower = math.floor(index).toInt
    val upper = lower + 1
    val weight = index % 1
    if (upper >= arr.length) arr(lower)
    else arr(lower) * (1 - weight) + arr(upper) * weight
  }

  /** getNonOutlierBounds (indexdocs.js:549-579):
    * (lowerLimit, lowerBound, upperLimit, upperBound, outlierCount).
    */
  def nonOutlierBounds(addressnumber: Seq[Seq[String]])
    : Option[(Double, Double, Double, Double, Int)] = {
    val errorPercentile = 0.1
    val targetPercentile = 0.5
    addressnumber.find(_ != null).flatMap { part =>
      val sorted = part.flatMap(s =>
        Option(s).map(graft.core.JsNum.parseIntPrefix).filterNot(_.isNaN))
        .sorted.toVector
      if (sorted.isEmpty) None
      else {
        val lowerP = math.floor(percentile(sorted, errorPercentile))
        val upperP = math.floor(percentile(sorted, 1.0 - errorPercentile))
        val deltaPerPercentile = (upperP - lowerP) / (1.0 - 2.0 * errorPercentile)
        val lowerLimit = lowerP - deltaPerPercentile * (targetPercentile + errorPercentile)
        val upperLimit = upperP + deltaPerPercentile * (targetPercentile + errorPercentile)
        val lowerBound = sorted.find(_ >= lowerLimit).getOrElse(sorted.head)
        val upperBound = sorted.reverse.find(_ <= upperLimit).getOrElse(sorted.last)
        val outliers = sorted.count(v => v < lowerLimit || v > upperLimit)
        Some((lowerLimit, lowerBound, upperLimit, upperBound, outliers))
      }
    }
  }

  /** I5: clamp interpolation range values to the non-outlier data bounds. */
  def clampRanges(doc: GeoDoc): GeoDoc = {
    if (doc.addressnumber.isEmpty) return doc
    nonOutlierBounds(doc.addressnumber) match {
      case Some((lowerLimit, lowerBound, upperLimit, upperBound, outliers))
        if outliers > 0 =>
        def clamp(prop: Seq[Seq[String]]): Seq[Seq[String]] =
          prop.map { part =>
            if (part == null) part
            else part.map { v =>
              val n = if (v == null) Double.NaN else graft.core.JsNum.parseIntPrefix(v)
              if (n.isNaN) v
              else if (n < lowerLimit) lowerBound.toLong.toString
              else if (n > upperLimit) upperBound.toLong.toString
              else v
            }
          }
        doc.copy(lfromhn = clamp(doc.lfromhn), ltohn = clamp(doc.ltohn),
          rfromhn = clamp(doc.rfromhn), rtohn = clamp(doc.rtohn))
      case _ => doc
    }
  }

  // ---- I6 center verification (indexdocs.js:485-496, 312-322) -----------

  /** Does the center fall inside any of the covers? */
  def verifyCenter(lon: Double, lat: Double, zxy: Seq[String]): Boolean =
    zxy.exists { s =>
      val p = s.split("/")
      val z = p(0).toInt; val x = p(1).toInt; val y = p(2).toInt
      val w = x.toDouble / (1 << z) * 360.0 - 180.0
      val e = (x + 1).toDouble / (1 << z) * 360.0 - 180.0
      def tileLat(ty: Int): Double = {
        val n = math.Pi - 2.0 * math.Pi * ty / (1 << z)
        math.toDegrees(math.atan(math.sinh(n)))
      }
      val north = tileLat(y); val south = tileLat(y + 1)
      lon >= w && lon <= e && lat >= south && lat <= north
    }

  /** Centroid (vertex mean, turf-style) as the corrected center. */
  def centroid(geom: Geom): (Double, Double) = {
    val pts = Geom.allPoints(geom)
    if (pts.isEmpty) (0.0, 0.0)
    else (pts.map(_._1).sum / pts.length, pts.map(_._2).sum / pts.length)
  }

  /** I6: keep the provided center if it verifies, else recompute. */
  def fixCenter(doc: GeoDoc, zxy: Seq[String]): GeoDoc = {
    if (verifyCenter(doc.centerLon, doc.centerLat, zxy)) doc
    else {
      val (lon, lat) = centroid(Geom.fromJson(doc.geometry))
      doc.copy(centerLon = lon, centerLat = lat)
    }
  }

  // ---- I18 addrTransform (reference lib/util/feature.js:15-121) ---------

  /** MultiPoint -> GeometryCollection lifts, parallel-array alignment
    * checks with the reference's error strings, lowercased address numbers,
    * and ITP (Multi)LineString lift + range-prop fill.
    */
  def addrTransform(doc: GeoDoc): Either[String, GeoDoc] = {
    var g: Geom = try Geom.fromJson(doc.geometry) catch {
      case e: Exception => return Left(s"invalid geometry on id:${doc.id}: ${e.getMessage}")
    }
    var d = doc

    if (d.addressnumber.nonEmpty) {
      g match {
        case mp: Geom.MultiPoint => g = Geom.Collection(Vector(mp))
        case _: Geom.Collection => ()
        case _ => return Left("carmen:addressnumber must be MultiPoint or GeometryCollection")
      }
      val gs = g.asInstanceOf[Geom.Collection].geoms
      if (d.addressnumber.length != gs.length)
        return Left("carmen:addressnumber array must be equal to geometry.geometries array")
      var i = 0
      while (i < d.addressnumber.length) {
        val nums = d.addressnumber(i)
        if (nums != null && nums.nonEmpty) {
          gs(i) match {
            case Geom.MultiPoint(pts) =>
              if (nums.length != pts.length)
                return Left("carmen:addressnumber[i] array must be equal to geometry.geometries[i] array")
            case _ =>
              return Left("non-null carmen:addressnumbers must parallel with MultiPoint geometries in GeometryCollection")
          }
        }
        i += 1
      }
      d = d.copy(addressnumber =
        d.addressnumber.map(p => if (p == null) p else p.map(s =>
          if (s == null) s else s.toLowerCase)))
    }

    if (d.intersections.nonEmpty) {
      g match {
        case mp: Geom.MultiPoint => g = Geom.Collection(Vector(mp))
        case _: Geom.Collection => ()
        case _ => return Left("carmen:intersections must be MultiPoint or GeometryCollection")
      }
      val gs = g.asInstanceOf[Geom.Collection].geoms
      var i = 0
      while (i < d.intersections.length) {
        val names = d.intersections(i)
        if (names != null && names.nonEmpty) {
          if (i >= gs.length)
            return Left("carmen:intersections[i] array must be equal to geometry.geometries[i] array")
          gs(i) match {
            case Geom.MultiPoint(pts) =>
              if (names.length != pts.length)
                return Left("carmen:intersections[i] array must be equal to geometry.geometries[i] array")
            case _ =>
              return Left("non-null carmen:intersections must parallel with MultiPoint geometries in GeometryCollection")
          }
        }
        i += 1
      }
    }

    if (d.rangetype.nonEmpty) {
      g match {
        case Geom.LineString(pts) =>
          g = Geom.Collection(Vector(Geom.MultiLineString(Vector(pts))))
        case Geom.MultiLineString(ls) =>
          g = Geom.Collection(Vector(Geom.MultiLineString(ls)))
        case _: Geom.Collection => ()
        case _ =>
          return Left("ITP results must be a LineString, MultiLineString, or GeometryCollection")
      }
      val gs = g.asInstanceOf[Geom.Collection].geoms
      if (gs.exists(_.isInstanceOf[Geom.LineString]))
        return Left("ITP geometries in a GeometryCollection must be MultiLineStrings")
      def fill(v: Seq[Seq[String]]): Seq[Seq[String]] =
        gs.indices.map(i => if (i < v.length && v(i) != null) v(i) else Seq.empty[String])
      d = d.copy(parityl = fill(d.parityl), parityr = fill(d.parityr),
        lfromhn = fill(d.lfromhn), rfromhn = fill(d.rfromhn),
        ltohn = fill(d.ltohn), rtohn = fill(d.rtohn))
    }

    Right(d.copy(geometry = Geom.toJson(g)))
  }

  /** The standardize front half (reference indexdocs.js:221-226): polygon
    * rewind (I2), then validation (I1), then addrTransform (I18).
    * Left = rejection with the reference's error string.
    */
  def standardizeDoc(doc0: GeoDoc): Either[String, GeoDoc] = {
    // carmen:text* whitespace trim (reference feature normalization —
    // observable in geocode-unit.text-trim.test.js)
    val doc = doc0.copy(text = if (doc0.text == null) doc0.text else doc0.text.trim,
      langTexts = doc0.langTexts.map { case (k, v) => k -> v.trim })
    val rewound = try {
      Geom.fromJson(doc.geometry) match {
        case p: Geom.Polygon => doc.copy(geometry = Geom.toJson(rewind(p)))
        case p: Geom.MultiPolygon => doc.copy(geometry = Geom.toJson(rewind(p)))
        case _ => doc
      }
    } catch { case _: Exception => doc } // invalid JSON is caught by validate
    validate(rewound) match {
      case Some(err) => Left(err)
      case None => addrTransform(rewound)
    }
  }
}
