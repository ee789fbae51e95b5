package graft.core

/** Antimeridian-aware bbox ops (reference lib/util/bbox.js:27-171) and the
  * I7 bbox derivation with the narrower-interpretation antimeridian split
  * (reference lib/indexer/indexdocs.js:327-335, bbox.js:84-106).
  * A bbox is (W, S, E, N); W > E means it crosses the antimeridian.
  */
object Bbox {

  type B = (Double, Double, Double, Double)

  /** Plain point-in-bbox (no AM). */
  def inside(lon: Double, lat: Double, b: B): Boolean =
    lon >= b._1 && lon <= b._3 && lat >= b._2 && lat <= b._4

  /** Plain bbox intersection (no AM). */
  def intersect(a: B, b: B): Boolean =
    a._1 <= b._3 && a._3 >= b._1 && a._2 <= b._4 && a._4 >= b._2

  /** Split an AM-crossing bbox into its two sides (bbox.js:139-147). */
  def amDecompose(b: B): Vector[B] =
    if (b._1 <= b._3) Vector(b)
    else Vector((b._1, b._2, 180.0, b._4), (-180.0, b._2, b._3, b._4))

  /** Point-in-bbox, AM-crossing aware (bbox.js:160-171). */
  def amInside(lon: Double, lat: Double, b: B): Boolean =
    lat >= b._2 && lat <= b._4 &&
      (if (b._1 <= b._3) lon >= b._1 && lon <= b._3
       else lon >= b._1 || lon <= b._3)

  /** Intersection, AM-crossing aware on both sides (bbox.js:149-157). */
  def amIntersect(a: B, b: B): Boolean =
    amDecompose(a).exists(sa => amDecompose(b).exists(sb => intersect(sa, sb)))

  /** clipBBox (bbox.js:113-123): clip an AM-crossing bbox at +/-179.9,
    * keeping the larger side.
    */
  def clipBBox(b: B): B =
    if (b._1 < b._3) b
    else if (math.abs(b._1) > math.abs(b._3)) (-179.9, b._2, b._3, b._4)
    else (b._1, b._2, 179.9, b._4)

  /** I7: derive a feature bbox; geometries spanning more than a hemisphere
    * pick the narrower of the prime-meridian vs antimeridian interpretation
    * (crossAntimeridian, bbox.js:84-106 — computed here from the vertex
    * partition by hemisphere rather than polygon clipping; identical for
    * vertex-derived extents).
    */
  def deriveBbox(geom: Geom): B = {
    val (w, s, e, n) = Geom.bbox(geom)
    if (e - w <= 180.0) return (w, s, e, n)
    val pts = Geom.allPoints(geom)
    val eastPts = pts.filter(_._1 >= 0)
    val westPts = pts.filter(_._1 < 0)
    if (eastPts.isEmpty || westPts.isEmpty) return (w, s, e, n)
    val eastMin = eastPts.map(_._1).min
    val eastMax = eastPts.map(_._1).max
    val westMin = westPts.map(_._1).min
    val westMax = westPts.map(_._1).max
    val pmWidth = eastMax + math.abs(westMin)
    val amWidth = (180.0 - eastMin) + (180.0 - math.abs(westMax))
    if (pmWidth > amWidth) (eastMin, s, westMax, n) // AM interpretation (W > E)
    else (westMin, s, eastMax, n)
  }
}
