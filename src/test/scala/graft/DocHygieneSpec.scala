package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Geom
import graft.index.DocHygiene
import graft.model.GeoDoc

/** Index-time hygiene ops (I1/I2/I4/I5/I6). */
class DocHygieneSpec extends AnyFunSuite {

  private val pt = """{"type":"Point","coordinates":[1,2]}"""

  test("I1 validation flags missing pieces") {
    assert(DocHygiene.validate(GeoDoc(1, "x", 0, pt, 1, 2)).isEmpty)
    assert(DocHygiene.validate(GeoDoc(0, "x", 0, pt, 1, 2)).isDefined)
    assert(DocHygiene.validate(GeoDoc(1, "", 0, pt, 1, 2)).isDefined)
    assert(DocHygiene.validate(GeoDoc(1, "x", 0, "", 1, 2)).isDefined)
    // synonym cap applies only to address-bearing docs
    val manySyn = (1 to 12).map(i => s"syn$i").mkString(",")
    assert(DocHygiene.validate(GeoDoc(1, manySyn, 0, pt, 1, 2)).isEmpty)
    assert(DocHygiene.validate(GeoDoc(1, manySyn, 0, pt, 1, 2,
      addressnumber = Seq(Seq("1")))).isDefined)
  }

  test("I2 rewind enforces exterior-CCW, holes-CW") {
    val cw = Vector((0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0), (0.0, 0.0))
    val ccw = cw.reverse
    val fixed = DocHygiene.rewind(Geom.Polygon(Vector(cw, ccw)))
    fixed match {
      case Geom.Polygon(rings) =>
        assert(rings(0) === ccw, "outer ring flipped to CCW")
        assert(rings(1) === cw, "hole flipped to CW")
      case g => fail(s"unexpected $g")
    }
  }

  test("I4 cover cap keeps the covers closest to the center") {
    val zxy = (0 until 10050).map(i => s"14/${8000 + i}/8000")
    val capped = DocHygiene.capCovers(zxy, -4.1748, 0.0, 14) // ~tile x=8002
    assert(capped.length === DocHygiene.MaxCovers)
    assert(capped.contains("14/8002/8000"))
    assert(!capped.contains(s"14/${8000 + 10049}/8000"), "farthest dropped")
  }

  test("I5 outlier clamp pulls 5000 into the data bound") {
    val doc = GeoDoc(1, "main st", 0, pt, 1, 2,
      addressnumber = Seq(Seq("1", "2", "3", "4", "5", "6", "7", "8", "9", "5000")),
      rangetype = "tiger",
      lfromhn = Seq(Seq("1", "5000")), ltohn = Seq(Seq("9", "5000")))
    val out = DocHygiene.clampRanges(doc)
    assert(out.lfromhn.head(0) === "1")
    assert(out.lfromhn.head(1) != "5000", s"clamped: ${out.lfromhn}")
    assert(graft.core.JsNum.parseIntPrefix(out.lfromhn.head(1)) <= 9)
  }

  test("I5 no clamp without outliers") {
    val doc = GeoDoc(1, "main st", 0, pt, 1, 2,
      addressnumber = Seq(Seq("1", "3", "5", "7", "9")),
      lfromhn = Seq(Seq("1")), ltohn = Seq(Seq("9")))
    assert(DocHygiene.clampRanges(doc) === doc)
  }

  test("I6 center verification and centroid fallback") {
    // tile 14/8192/8192 covers [0, 0.02197) x (-0.02197, 0]
    assert(DocHygiene.verifyCenter(0.01, -0.01, Seq("14/8192/8192")))
    assert(!DocHygiene.verifyCenter(5.0, 5.0, Seq("14/8192/8192")))
    val line = """{"type":"LineString","coordinates":[[0,0],[2,2]]}"""
    val fixed = DocHygiene.fixCenter(
      GeoDoc(1, "x", 0, line, 50, 50), Seq("14/8192/8192"))
    assert(fixed.centerLon === 1.0 && fixed.centerLat === 1.0)
  }
}
