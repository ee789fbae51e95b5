package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.core._
import scala.jdk.CollectionConverters._

/** Grid codec / 3-bit log score / permute masks / proximity math vs goldens
  * produced by the reference's JS (reference lib/util/grid.js, permute.js,
  * proximity.js, lib/text-processing/termops.js:950-987).
  */
class NumericSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()
  private lazy val g: JsonNode =
    mapper.readTree(getClass.getResourceAsStream("/graft/goldens/numeric.json"))

  test("grid encode/decode matches reference") {
    for (c <- g.get("grid").elements().asScala) {
      val in = c.get("in")
      val grid = GridCodec.Grid(
        x = in.get("x").asInt(), y = in.get("y").asInt(),
        relev = in.get("relev").asDouble(), score = in.get("score").asInt(),
        id = in.get("id").asLong())
      val enc = GridCodec.encode(grid)
      assert(enc === c.get("enc").asLong(), s"encode $grid")
      val dec = GridCodec.decode(enc)
      val expDec = c.get("dec")
      assert(dec.relev === expDec.get("relev").asDouble())
      assert(dec.score === expDec.get("score").asInt())
      assert(dec.x === expDec.get("x").asInt())
      assert(dec.y === expDec.get("y").asInt())
      assert(dec.id === expDec.get("id").asLong())
    }
  }

  test("3-bit log scale encode/decode matches reference (incl. fround)") {
    for (c <- g.get("log3").elements().asScala) {
      val num = c.get("num").asDouble()
      val max = c.get("max").asDouble()
      val enc = GridCodec.encode3BitLogScale(num, max)
      assert(enc === c.get("enc").asInt(), s"encode3BitLogScale($num, $max)")
      assert(GridCodec.decode3BitLogScale(enc, max) === c.get("dec").asDouble(),
        s"decode3BitLogScale($enc, $max)")
    }
  }

  test("permute.all / permute.continuous match reference") {
    for (l <- 1 to 8) {
      val expAll = g.get("permuteAll").get(l.toString).elements().asScala.map(_.asInt()).toVector
      assert(Permute.all(l) === expAll, s"all($l)")
      val expCont = g.get("permuteCont").get(l.toString).elements().asScala.map(_.asInt()).toVector
      assert(Permute.continuous(l) === expCont, s"continuous($l)")
    }
  }

  test("proximity distance/weights/scoredist match reference") {
    for (c <- g.get("proximity").elements().asScala) {
      val prox = c.get("prox")
      val center = c.get("center")
      val cover = c.get("cover")
      val d = Proximity.distance(prox.get(0).asDouble(), prox.get(1).asDouble(),
        center.get(0).asDouble(), center.get(1).asDouble(),
        cover.get("x").asInt(), cover.get("y").asInt(), cover.get("zoom").asInt())
      assert(d === c.get("distance").asDouble(), "distance")
      assert(Proximity.distWeight(d, cover.get("zoom").asInt()) ===
        c.get("distWeight").asDouble(), "distWeight")
      assert(Proximity.scoreWeight(100, 0, 1000) === c.get("scoreWeight").asDouble())
      assert(Proximity.scoredist(100, 0, 1000, d, cover.get("zoom").asInt()) ===
        c.get("scoredist").asDouble(), "scoredist")
    }
  }

  test("center2zxy matches reference") {
    for (c <- g.get("center2zxy").elements().asScala) {
      val (z, x, y) = Mercator.center2zxy(c.get("lon").asDouble(),
        c.get("lat").asDouble(), c.get("z").asInt())
      val exp = c.get("out")
      assert((z, x, y) === (exp.get(0).asInt(), exp.get(1).asInt(), exp.get(2).asInt()),
        s"center2zxy(${c.get("lon")}, ${c.get("lat")}, ${c.get("z")})")
    }
  }

  test("distscore matches reference") {
    for (c <- g.get("distscore").elements().asScala)
      assert(Proximity.distscore(c.get("dist").asDouble(), c.get("score").asDouble()) ===
        c.get("out").asDouble())
  }

  test("relevanceScore matches reference") {
    for (c <- g.get("relevanceScore").elements().asScala)
      assert(Proximity.relevanceScore(c.get("relev").asDouble(), c.get("sd").asDouble(),
        addressNull = c.get("addr").isNull, ghost = c.get("ghost").asBoolean()) ===
        c.get("out").asDouble())
  }

  test("tmpid / id24") {
    assert(GridCodec.id24(-5L) === 5L)
    assert(GridCodec.id24((1L << 24) + 7) === 7L)
    assert(GridCodec.tmpid(3, 7) === 3L * (1L << 25) + 7)
  }
}
