package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.core._
import scala.jdk.CollectionConverters._

/** Phrase-pipeline ports vs goldens from the reference's termops
  * (reference lib/text-processing/termops.js:388-837).
  */
class PhrasesSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()
  private lazy val g: JsonNode =
    mapper.readTree(getClass.getResourceAsStream("/graft/goldens/phrases.json"))

  private val freq = Phrases.Freq(Map(
    "main" -> 100L, "st" -> 300L, "west" -> 50L, "lake" -> 40L, "view" -> 30L,
    "rd" -> 200L, "englewood" -> 5L, "new" -> 80L, "jersey" -> 20L,
    "san" -> 60L, "jose" -> 15L, "fake" -> 1L, "street" -> 120L, "av" -> 90L,
    "the" -> 400L), total = 1000L, maxScore = 500.0)

  private def strs(n: JsonNode) = n.elements().asScala.map(_.asText()).toVector

  test("getWeights matches reference") {
    for (c <- g.get("weights").elements().asScala) {
      val toks = strs(c.get("in"))
      val exp = c.get("out").elements().asScala.map(_.asDouble()).toVector
      assert(Phrases.getWeights(toks, freq) === exp, s"tokens=$toks")
    }
  }

  test("query-side permutations (continuous masks) match reference") {
    for (c <- g.get("permsQuery").elements().asScala) {
      val toks = strs(c.get("in"))
      val got = Phrases.permutations(toks, None, all = false)
      val exp = c.get("out").elements().asScala.toVector
      assert(got.length === exp.length, s"count for $toks")
      got.zip(exp).foreach { case (gp, ep) =>
        assert(gp.terms === strs(ep.get("t")), s"terms $toks")
        assert(gp.mask === ep.get("mask").asInt(), s"mask $toks")
        assert(gp.ender === ep.get("ender").asBoolean(), s"ender $toks")
      }
    }
  }

  test("getIndexablePhrases matches reference") {
    for (c <- g.get("indexablePhrases").elements().asScala) {
      val toks = strs(c.get("in"))
      val got = Phrases.getIndexablePhrases(
        Phrases.IndexableText(toks, Vector("default"), 17, reduceRelevance = false), freq)
      val exp = c.get("out").elements().asScala.toVector
      assert(got.length === exp.length, s"count for $toks: got=$got")
      got.zip(exp).foreach { case (gp, ep) =>
        assert(gp.phrase === ep.get("phrase").asText(), s"phrase $toks")
        assert(gp.relev === ep.get("relev").asDouble(), s"relev $toks ${gp.phrase}")
        assert(gp.hash === ep.get("hash").asInt())
      }
    }
  }

  test("getIndexableText (no replacers) matches reference") {
    for (c <- g.get("indexableText").elements().asScala) {
      val in = c.get("in").asText()
      val got = Phrases.getIndexableText(in)
      val exp = c.get("out").elements().asScala.toVector
      assert(got.length === exp.length, s"count for $in")
      got.zip(exp).foreach { case (gt, et) =>
        assert(gt.tokens === strs(et.get("tokens")), s"tokens $in")
        assert(gt.languages === strs(et.get("languages")), s"languages $in")
        assert(gt.hash === et.get("hash").asInt(), s"hash $in")
      }
    }
  }

  test("minimalIndexableText matches reference") {
    for (c <- g.get("minimal").elements().asScala) {
      val in = c.get("in").asText()
      val got = Phrases.minimalIndexableText(in)
      val exp = c.get("out").elements().asScala
        .map(x => x.elements().asScala.map(_.asText()).toVector).toVector
      assert(got === exp, s"in=$in")
    }
  }
}
