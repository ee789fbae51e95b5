package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Bbox, Geom}

/** F4/I7 antimeridian bbox ops — golden cases ported from the reference's
  * test/unit/util/bbox.inside-box.test.js and bbox.intersect.test.js.
  */
class BboxSpec extends AnyFunSuite {

  test("inside / amInside agree on plain bboxes") {
    val b = (-80.0, 30.0, -70.0, 40.0)
    assert(Bbox.inside(-77, 38, b) && Bbox.amInside(-77, 38, b))
    assert(!Bbox.inside(-87, 38, b) && !Bbox.amInside(-87, 38, b))
  }

  test("amInside handles AM-crossing bboxes") {
    val b = (170.0, 30.0, -170.0, 40.0)
    assert(Bbox.amInside(175, 38, b))
    assert(Bbox.amInside(-175, 38, b))
    assert(!Bbox.inside(175, 38, b))
    assert(!Bbox.amInside(160, 38, b))
    assert(!Bbox.amInside(-160, 38, b))
  }

  test("intersect / amIntersect plain cases") {
    val b1 = (-75.0, 35.0, -65.0, 45.0)
    assert(Bbox.intersect(b1, (-66.0, 34.0, -64.0, 44.0)))
    assert(Bbox.amIntersect(b1, (-66.0, 34.0, -64.0, 44.0)))
    assert(!Bbox.intersect(b1, (-66.0, -44.0, -64.0, -34.0)))
    assert(!Bbox.amIntersect(b1, (-66.0, -44.0, -64.0, -34.0)))
  }

  test("amIntersect handles AM-crossing bboxes") {
    val am1 = (170.0, 35.0, -170.0, 45.0)
    assert(Bbox.amIntersect(am1, (178.0, 34.0, -169.0, 44.0)))
    assert(Bbox.amIntersect(am1, (-175.0, 34.0, -169.0, 44.0)))
    assert(Bbox.amIntersect(am1, (172.0, 34.0, 178.0, 44.0)))
    assert(!Bbox.intersect(am1, (178.0, 34.0, -169.0, 44.0)))
    assert(!Bbox.amIntersect(am1, (178.0, -44.0, -169.0, -34.0)))
    assert(!Bbox.amIntersect(am1, (-175.0, -44.0, -169.0, -34.0)))
    assert(!Bbox.amIntersect(am1, (172.0, -44.0, 178.0, -34.0)))
  }

  test("clipBBox keeps the larger side of an AM crossing") {
    // |W| > |E| -> clip W to -179.9 (the eastern span is the larger side)
    assert(Bbox.clipBBox((170.0, 30.0, -10.0, 40.0)) === ((-179.9, 30.0, -10.0, 40.0)))
    // |W| < |E| -> clip E to 179.9
    assert(Bbox.clipBBox((10.0, 30.0, -170.0, 40.0)) === ((10.0, 30.0, 179.9, 40.0)))
    assert(Bbox.clipBBox((-10.0, 30.0, 10.0, 40.0)) === ((-10.0, 30.0, 10.0, 40.0)))
  }

  test("I7 deriveBbox picks the narrower antimeridian interpretation") {
    // a Fiji-style multipoint straddling the AM: [-179.9..179.9] naive
    val g = Geom.MultiPoint(Vector((179.0, -17.0), (-179.5, -16.0), (178.0, -18.0)))
    val b = Bbox.deriveBbox(g)
    assert(b._1 === 178.0 && b._3 === -179.5, s"AM interpretation (W>E): $b")
    // plain geometry keeps the ordinary bbox
    val plain = Geom.MultiPoint(Vector((-10.0, 0.0), (10.0, 5.0)))
    assert(Bbox.deriveBbox(plain) === ((-10.0, 0.0, 10.0, 5.0)))
  }
}
