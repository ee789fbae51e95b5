package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Fuzzy
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward

/** Fuzzy-PREFIX ending types (the P6 tail): an autocomplete query whose
  * final, partially-typed word — or any earlier word — carries one DL<=1
  * edit still matches, with the >=0.75 edit penalty (reference
  * fuzzyMatchWindows/fuzzyMatchMulti with endingType anyPrefix /
  * wordBoundaryPrefix, lib/geocoder/phrasematch.js:83-96,106,235-247).
  * Geocode fixtures ported from the autocomplete half of
  * test/acceptance/geocode-unit.fuzzy.test.js (the pinball-parlour corpus).
  */
class FuzzyPrefixAcceptanceSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var index: IndexBuilder.CarmenIndex = _

  private def pt(lon: Double, lat: Double): String =
    s"""{"type":"Point","coordinates":[$lon,$lat]}"""

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])
    index = IndexBuilder.build(spark, Seq(
      (LayerConfig("place", idx = 0, zoom = 6, typ = "place"),
        docs(
          GeoDoc(1, "Pinball Parlour Arcade", 100, pt(0, 0), 0, 0),
          GeoDoc(2, "Pinball Parlor Arcade", 10, pt(0, 0), 0, 0)))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(q: String, fuzzy: Boolean, autocomplete: Boolean)
      : Seq[(String, Long, Double)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, index, queries,
      Forward.Options(fuzzy = fuzzy, autocomplete = autocomplete,
        limitVerify = 2))
      .select(col("place_name"), col("feature_id"), col("relev"))
      .as[(String, Long, Double)].collect().toSeq
  }

  // --- Fuzzy.fuzzyPrefixMatch unit semantics ---

  test("fuzzyPrefixMatch: typo in the final partially-typed word") {
    // 'parlor' is within one edit of prefixes of 'parlour'
    assert(Fuzzy.fuzzyPrefixMatch("pinball parlor", "pinball parlour arcade",
      wordBoundary = false) === Some((1, "pinball parlour")))
    // typo strictly inside the final prefix word
    assert(Fuzzy.fuzzyPrefixMatch("pinball parlaur", "pinball parlour arcade",
      wordBoundary = false) === Some((1, "pinball parlour")))
  }

  test("fuzzyPrefixMatch: typo in a non-final word, final word exact prefix") {
    assert(Fuzzy.fuzzyPrefixMatch("pinbal parlo", "pinball parlour arcade",
      wordBoundary = false) === Some((1, "pinball parlo")))
    assert(Fuzzy.fuzzyPrefixMatch("springfeld pennsylvan",
      "springfield pennsylvania", wordBoundary = false) ===
      Some((1, "springfield pennsylvan")))
  }

  test("fuzzyPrefixMatch: exact prefixes and whole-phrase matches are owned by other branches") {
    // plain prefix, no edit -> exact prefix branch
    assert(Fuzzy.fuzzyPrefixMatch("pinball parlo", "pinball parlour arcade",
      wordBoundary = false).isEmpty)
    // equal word counts with a complete final word -> whole-phrase fuzzy
    assert(Fuzzy.fuzzyPrefixMatch("pinball parlor arcade",
      "pinball parlour arcade", wordBoundary = false).isEmpty)
    assert(Fuzzy.fuzzyPrefixMatch("pinball parlour arcade",
      "pinball parlour arcade", wordBoundary = false).isEmpty)
  }

  test("fuzzyPrefixMatch: one edit budget total") {
    assert(Fuzzy.fuzzyPrefixMatch("pinbal parlar", "pinball parlour arcade",
      wordBoundary = false).isEmpty)
    assert(Fuzzy.fuzzyPrefixMatch("pinbal parlaur", "pinball parlour arcade",
      wordBoundary = false).isEmpty)
  }

  test("fuzzyPrefixMatch: wordBoundary endings demand exact complete final words") {
    // the final word ended at a boundary: it must equal a complete indexed
    // word exactly — no edits ('30th station' semantics), no partial prefix
    assert(Fuzzy.fuzzyPrefixMatch("pinball parlou", "pinball parlour arcade",
      wordBoundary = true).isEmpty)
    assert(Fuzzy.fuzzyPrefixMatch("pinbal parl", "pinball parlour arcade",
      wordBoundary = true).isEmpty)
    // exact complete final word + an earlier edit is allowed
    assert(Fuzzy.fuzzyPrefixMatch("pinbal parlour", "pinball parlour arcade",
      wordBoundary = true) === Some((1, "pinball parlour")))
    // anyPrefix accepts the partial-prefix final that wordBoundary rejects
    assert(Fuzzy.fuzzyPrefixMatch("pinbal parl", "pinball parlour arcade",
      wordBoundary = false) === Some((1, "pinball parl")))
  }

  test("fuzzyPrefixMatch: MIN_CORRECTION_LENGTH guards single-word phrases only") {
    // single-word phrase, short words -> no correction
    assert(Fuzzy.fuzzyPrefixMatch("stn", "st", wordBoundary = false).isEmpty)
    // short final word inside a multi-word phrase corrects ('30th stn' ->
    // '30th st stn', reference fuzzy-with-tokens-and-autocomplete)
    assert(Fuzzy.fuzzyPrefixMatch("30th stn", "30th st stn",
      wordBoundary = false) === Some((1, "30th st")))
    // exact prefix of the next word needs no edit -> exact branch owns it
    assert(Fuzzy.fuzzyPrefixMatch("pin", "pint arcade",
      wordBoundary = false).isEmpty)
  }

  test("digit-bearing tokens are never fuzzy-edited") {
    // house/route numbers must match exactly in every fuzzy kernel: a
    // query for '101 main st' must not correct to '103 main st'
    assert(Fuzzy.phraseDistance("101 main st", "103 main st").isEmpty)
    assert(Fuzzy.phraseDistance("main st 101", "main st 102").isEmpty)
    assert(Fuzzy.fuzzyPrefixMatch("101 main", "103 main st",
      wordBoundary = false).isEmpty)
    assert(Fuzzy.fuzzyPrefixMatch("main 10", "main 12 st",
      wordBoundary = false).isEmpty)
    assert(!Fuzzy.phraseVariants("101 main st").exists(v =>
      v.split(" ")(0) != "101"))
    // letter words beside digits still get the budget
    assert(Fuzzy.phraseDistance("101 mian st", "101 main st") === Some(1))
    assert(Fuzzy.fuzzyPrefixMatch("101 mian", "101 main st",
      wordBoundary = false) === Some((1, "101 main")))
  }

  // --- geocode-unit.fuzzy.test.js autocomplete fixtures ---

  test("parlor - prefix without fuzzy: Parlor is only result") {
    val res = fw("pinball parlor", fuzzy = false, autocomplete = true)
    assert(res.length === 1, s"got $res")
    assert(res.head._1 === "Pinball Parlor Arcade")
    assert(res.head._2 === 2L)
    assert(res.head._3 === 1.0)
  }

  test("parlor - prefix with fuzzy: Parlor wins on relevance, Parlour second") {
    val res = fw("pinball parlor", fuzzy = true, autocomplete = true)
    assert(res.length === 2, s"got $res")
    assert(res(0)._1 === "Pinball Parlor Arcade", s"got $res")
    assert(res(0)._2 === 2L)
    assert(res(0)._3 === 1.0, s"got $res")
    assert(res(1)._1 === "Pinball Parlour Arcade", s"got $res")
    assert(res(1)._2 === 1L)
    assert(res(1)._3 < 1.0, s"got $res")
  }

  test("parloar - prefix with fuzzy: tied relevance; parlour wins on score") {
    val res = fw("pinball parloar arcade", fuzzy = true, autocomplete = true)
    assert(res.length === 2, s"got $res")
    assert(res(0)._1 === "Pinball Parlour Arcade", s"got $res")
    assert(res(0)._2 === 1L)
    assert(res(0)._3 < 1.0)
    assert(res(1)._1 === "Pinball Parlor Arcade", s"got $res")
    assert(res(1)._2 === 2L)
    assert(res(1)._3 < 1.0)
    assert(res(0)._3 === res(1)._3, s"got $res")
  }

  test("typo in a non-final word with a prefix ender still matches") {
    val res = fw("pinbal parlo", fuzzy = true, autocomplete = true)
    assert(res.length === 2, s"got $res")
    assert(res.forall(_._3 < 1.0), s"got $res")
    // parlour outscores parlor at equal relevance
    assert(res(0)._2 === 1L, s"got $res")
  }

  test("no fuzzy-prefix help when fuzzy is off") {
    val res = fw("pinball parlaur", fuzzy = false, autocomplete = true)
    assert(res.isEmpty, s"got $res")
  }
}
