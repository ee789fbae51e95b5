package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward
import TestGeom._

/** Ported matching-text fixtures (reference
  * test/acceptance/geocode-unit.matching-text.test.js): matching_text
  * recovers the matched synonym/translation (suppressed for category
  * matches), and matching_place_name assembles the place name from each
  * member's MATCHED text — lead and context alike.
  */
class MatchingTextSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var index: IndexBuilder.CarmenIndex = _
  private var addr: IndexBuilder.CarmenIndex = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])

    val t32 = tilePoly(6, (32, 32))
    index = IndexBuilder.build(spark, Seq(
      (LayerConfig("country", idx = 0, zoom = 6, typ = "country",
        geocoderName = "country", geocoderFormat = "{{country.name}}"),
        docs(GeoDoc(1, "United States,America", 0, t32, 0, 0))),
      (LayerConfig("region", idx = 1, zoom = 6, typ = "region",
        geocoderName = "region",
        geocoderFormat = "{{region.name}} {{country.name}}"),
        docs(GeoDoc(1, "Kansas,Jayhawks", 0, t32, 0, 0))),
      (LayerConfig("poi", idx = 2, zoom = 14, typ = "poi",
        categories = Set("coffee", "arena")),
        docs(
          GeoDoc(1, "Cool Beans,CB cafe, coffee", 0, pt(0, 0), 0, 0),
          GeoDoc(2, "Sand,restaurant", 0, pt(0, 0), 0, 0,
            langTexts = Map("es" -> "arena")),
          GeoDoc(3, "Whole Foods Market,Whole Foods #340", 0, pt(0, 0), 0, 0,
            langTexts = Map("es" -> "arena"))))))

    addr = IndexBuilder.build(spark, Seq(
      (LayerConfig("address", idx = 0, zoom = 6, typ = "address",
        geocoderAddress = true,
        geocoderFormat = "{{address.number}} {{address.name}}"),
        docs(GeoDoc(1, "US Highway 123,Main St East", 0,
          mpt((0, 0), (0, 0), (0, 0)), 0, 0,
          addressnumber = Seq(Seq("43", "32", "243")))))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(idx: IndexBuilder.CarmenIndex, q: String): (String, String, String) = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    val res = Forward.forward(spark, idx, queries,
      Forward.Options(limitVerify = 1))
      .select(col("place_name"), coalesce(col("matching_text"), lit("")),
        col("matching_place_name"))
      .as[(String, String, String)].collect().toSeq
    assert(res.nonEmpty, s"no result for '$q'")
    res.head
  }

  test("kansas america: context synonym fills matching_place_name") {
    val (pn, mt, mpn) = fw(index, "kansas america")
    assert(pn === "Kansas United States", s"got $pn")
    assert(mt === "", s"got '$mt'")
    assert(mpn === "Kansas America", s"got '$mpn'")
  }

  test("america: country synonym is the matching text") {
    val (pn, mt, mpn) = fw(index, "america")
    assert(pn === "United States", s"got $pn")
    assert(mt === "America", s"got '$mt'")
    assert(mpn === "America", s"got '$mpn'")
  }

  test("jayhawks: region synonym with primary context name") {
    val (pn, mt, mpn) = fw(index, "jayhawks")
    assert(pn === "Kansas United States", s"got $pn")
    assert(mt === "Jayhawks", s"got '$mt'")
    assert(mpn === "Jayhawks United States", s"got '$mpn'")
  }

  test("CB cafe, Jayhawks: poi synonym + region synonym") {
    val (pn, mt, mpn) = fw(index, "CB cafe, Jayhawks")
    assert(pn === "Cool Beans, Kansas, United States", s"got $pn")
    assert(mt === "CB cafe", s"got '$mt'")
    assert(mpn === "CB cafe, Jayhawks, United States", s"got '$mpn'")
  }

  test("coffee, Jayhawks: category match suppresses lead matching_text") {
    val (pn, mt, mpn) = fw(index, "coffee, Jayhawks")
    assert(pn === "Cool Beans, Kansas, United States", s"got $pn")
    assert(mt === "", s"got '$mt'")
    assert(mpn === "Cool Beans, Jayhawks, United States", s"got '$mpn'")
  }

  test("arena, Jayhawks: translation that collides with a category name") {
    val (pn, mt, mpn) = fw(index, "arena, Jayhawks")
    assert(pn === "Whole Foods Market, Kansas, United States", s"got $pn")
    assert(mt === "arena", s"got '$mt'")
    assert(mpn === "arena, Jayhawks, United States", s"got '$mpn'")
  }

  test("whole foods #340: phrase-hash collision resolves by levenshtein") {
    val (_, mt, _) = fw(index, "whole foods #340")
    assert(mt === "Whole Foods #340", s"got '$mt'")
  }

  test("43 US Highway 123: primary name, no matching text") {
    val (pn, mt, mpn) = fw(addr, "43 US Highway 123")
    assert(pn === "43 US Highway 123", s"got $pn")
    assert(mt === "" && mpn === "", s"got '$mt' / '$mpn'")
  }

  test("43 Main St East: address synonym matching_place_name") {
    val (pn, mt, mpn) = fw(addr, "43 Main St East")
    assert(pn === "43 US Highway 123", s"got $pn")
    assert(mt === "Main St East", s"got '$mt'")
    assert(mpn === "43 Main St East", s"got '$mpn'")
  }

  test("243 Main St East: another cluster point") {
    val (pn, mt, mpn) = fw(addr, "243 Main St East")
    assert(pn === "243 US Highway 123", s"got $pn")
    assert(mt === "Main St East", s"got '$mt'")
    assert(mpn === "243 Main St East", s"got '$mpn'")
  }
}
