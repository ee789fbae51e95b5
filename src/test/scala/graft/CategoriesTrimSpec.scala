package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.TokenSpec
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.{Forward, Reverse}
import TestGeom._

/** Ported fixtures:
  *
  *  - reference test/acceptance/geocode-unit.geocoder_categories.test.js —
  *    a category query resolves the category-tagged synonym feature at
  *    relevance 1 with the first synonym as display text;
  *  - geocode-unit.early-degen.test.js — autocomplete prefix "56
  *    Brehmestr." finds "Brehmestraße 56" through the unidecoded index;
  *  - geocode-unit.text-trim.test.js — carmen:text with stray whitespace
  *    is trimmed in forward and reverse display, across languages.
  */
class CategoriesTrimSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var cats: IndexBuilder.CarmenIndex = _
  private var degen: IndexBuilder.CarmenIndex = _
  private var trim: IndexBuilder.CarmenIndex = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])

    cats = IndexBuilder.build(spark, Seq(
      (LayerConfig("poi", idx = 0, zoom = 6, typ = "poi",
        categories = Set("pizza", "pz"),
        geocoderTokens = Seq("pizza" -> TokenSpec("pz"))),
        docs(
          GeoDoc(1, "delicious,tofu", 1, pt(0, 0), 0, 0),
          GeoDoc(2, "delicious,pizza", 0, pt(0, 0), 0, 0)))))

    degen = IndexBuilder.build(spark, Seq(
      (LayerConfig("address", idx = 0, zoom = 6, typ = "address",
        geocoderAddress = true, geocoderName = "address",
        geocoderFormat = "{{address.name}} {{address.number}}"),
        docs(GeoDoc(1, "Brehmestraße", 0, mpt((0, 0)), 0, 0,
          addressnumber = Seq(Seq("56")))))))

    trim = IndexBuilder.build(spark, Seq(
      (LayerConfig("country", idx = 0, zoom = 6, typ = "country",
        languages = Seq("en", "zh")),
        docs(GeoDoc(1, "  Colombia\n", 0, pt(0, 0), 0, 0,
          langTexts = Map("en" -> " Colombia\n", "zh" -> " 哥伦比亚\n")))),
      (LayerConfig("region", idx = 1, zoom = 6, typ = "region",
        languages = Seq("en", "zh"),
        geocoderFormat = "{{region.name}}, {{country.name}}"),
        docs(GeoDoc(1, " Bogotá ", 0, pt(0, 0), 0, 0,
          langTexts = Map("en" -> " Bogota ", "zh" -> " 波哥大 "))))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(idx: IndexBuilder.CarmenIndex, q: String,
                 opts: Forward.Options = Forward.Options()): Seq[(String, Long, Double)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, idx, queries, opts)
      .select(col("place_name"), col("feature_id"), col("relev"))
      .as[(String, Long, Double)].collect().toSeq
  }

  private def rev(idx: IndexBuilder.CarmenIndex, lon: Double, lat: Double,
                  language: Option[String] = None): Seq[String] = {
    val sp = spark; import sp.implicits._
    val pts = Seq((1L, lon, lat)).toDF("query_id", "lon", "lat")
    Reverse.reverseWithOptions(spark, idx, pts,
      Reverse.ReverseOptions(language = language))
      .select(col("place_name")).as[String].collect().toSeq
  }

  // --- geocoder_categories.test.js ---

  test("categories: non-category synonym query resolves poi.1") {
    val res = fw(cats, "delicious", Forward.Options(limitVerify = 1))
    assert(res.head._1 === "delicious" && res.head._2 === 1L, s"got $res")
    assert(res.head._3 === 1.0, s"got $res")
  }

  test("categories: category query resolves poi.2 at relevance 1") {
    val res = fw(cats, "pizza", Forward.Options(limitVerify = 1))
    assert(res.head._1 === "delicious" && res.head._2 === 2L, s"got $res")
    assert(res.head._3 === 1.0, s"got $res")
  }

  // --- early-degen.test.js ---

  test("early-degen: '56 Brehmestr.' autocompletes Brehmestraße 56") {
    val res = fw(degen, "56 Brehmestr.", Forward.Options(limitVerify = 1))
    assert(res.nonEmpty && res.head._1 === "Brehmestraße 56", s"got $res")
  }

  // --- text-trim.test.js ---

  test("text-trim: forward trims default text") {
    val res = fw(trim, "Bogota", Forward.Options(limitVerify = 1))
    assert(res.head._1 === "Bogotá, Colombia", s"got $res")
  }

  test("text-trim: reverse trims default text") {
    val res = rev(trim, 0, 0)
    assert(res.head === "Bogotá, Colombia", s"got $res")
  }

  test("text-trim: forward language=en") {
    val res = fw(trim, "Bogota",
      Forward.Options(limitVerify = 1, language = Some("en")))
    assert(res.head._1 === "Bogota, Colombia", s"got $res")
  }

  test("text-trim: reverse language=en") {
    val res = rev(trim, 0, 0, Some("en"))
    assert(res.head === "Bogota, Colombia", s"got $res")
  }

  test("text-trim: forward language=zh") {
    val res = fw(trim, "Bogota",
      Forward.Options(limitVerify = 1, language = Some("zh")))
    assert(res.head._1 === "波哥大, 哥伦比亚", s"got $res")
  }

  test("text-trim: reverse language=zh") {
    val res = rev(trim, 0, 0, Some("zh"))
    assert(res.head === "波哥大, 哥伦比亚", s"got $res")
  }
}
