package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.core.Geom._

/** Tile-cover assignment tests. Goldens come from the reference's indexer
  * unit expectations (reference test/unit/indexer/indexdocs.test.js:72,239:
  * point (0,0) z6 -> 6/32/32; line (0,0)-(1,1) z6 -> [6/32/31, 6/32/32]).
  */
class TileCoverSpec extends AnyFunSuite {
  test("point cover (reference indexdocs golden)") {
    assert(TileCover.zxy(Point((0, 0)), 6) === Vector("6/32/32"))
  }

  test("line cover (reference indexdocs golden, order included)") {
    val g = Collection(Vector(MultiLineString(Vector(Vector((0.0, 0.0), (1.0, 1.0))))))
    assert(TileCover.zxy(g, 6) === Vector("6/32/31", "6/32/32"))
  }

  test("point covers across zooms agree with center2zxy mercator math") {
    for ((lon, lat) <- Seq((-97.75, 30.3), (13.4, 52.5), (151.2, -33.8), (-0.1, 51.5));
         z <- Seq(6, 12, 14)) {
      val (x, y) = Mercator.pointToTile(lon, lat, z)
      assert(x >= 0 && x < (1 << z) && y >= 0 && y < (1 << z))
      val cov = TileCover.cover(Point((lon, lat)), z)
      assert(cov === Vector((x, y)))
    }
  }

  test("polygon cover contains tiles of interior points and boundary walk") {
    val ring = Vector((0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0))
    val poly = Polygon(Vector(ring))
    for (z <- Seq(6, 8, 10)) {
      val cov = TileCover.cover(poly, z).toSet
      // interior sample points must be covered
      for (lon <- BigDecimal(0.1) to BigDecimal(1.9) by 0.3;
           lat <- BigDecimal(0.1) to BigDecimal(1.9) by 0.3) {
        val t = Mercator.pointToTile(lon.toDouble, lat.toDouble, z)
        assert(cov.contains(t), s"z=$z interior $lon,$lat tile $t missing")
      }
      // no duplicates in emitted order
      val raw = TileCover.cover(poly, z)
      assert(raw.distinct.size === raw.size)
    }
  }

  test("multipolygon and multipoint covers") {
    val mp = MultiPoint(Vector((0.5, 0.5), (0.5, 0.5), (1.5, 1.5)))
    val cov = TileCover.cover(mp, 10)
    assert(cov.distinct.size === cov.size) // hash dedupes
    val mpoly = MultiPolygon(Vector(
      Vector(Vector((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0))),
      Vector(Vector((5.0, 5.0), (6.0, 5.0), (6.0, 6.0), (5.0, 6.0), (5.0, 5.0)))))
    val cov2 = TileCover.cover(mpoly, 8).toSet
    assert(cov2.contains(Mercator.pointToTile(0.5, 0.5, 8)))
    assert(cov2.contains(Mercator.pointToTile(5.5, 5.5, 8)))
  }

  test("pip raycast basic") {
    val rings = Vector(Vector((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)))
    assert(Geom.pipRaycast(rings, 5, 5))
    assert(!Geom.pipRaycast(rings, 15, 5))
    // with hole
    val withHole = rings :+ Vector((4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0))
    assert(!Geom.pipRaycast(withHole, 5, 5))
    assert(Geom.pipRaycast(withHole, 2, 2))
  }

  test("geojson round trip") {
    val g = Collection(Vector(
      Point((1.5, 2.5)),
      Polygon(Vector(Vector((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0))))))
    assert(Geom.fromJson(Geom.toJson(g)) === g)
  }
}
