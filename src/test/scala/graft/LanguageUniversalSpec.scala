package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward
import TestGeom._

/** Ported universal-text fixtures (reference
  * test/acceptance/geocode-unit.language-universal.test.js):
  * carmen:text_universal synonyms match in every language without the
  * out-of-language penalty, pass languageMode=strict, and a complete
  * universal match outranks an autocompleted default text.
  */
class LanguageUniversalSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var index: IndexBuilder.CarmenIndex = _

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
        geocoderName = "country", languages = Seq("en", "sv")),
        docs(
          GeoDoc(1, "Wilderness", 0, t32, 0, 0,
            langTexts = Map("universal" -> "Cerracs")),
          GeoDoc(2, "United States", 1000, t32, 0, 0,
            langTexts = Map("sv" -> "USA", "universal" -> "US,USA")))),
      (LayerConfig("region", idx = 1, zoom = 6, typ = "region",
        geocoderName = "region", languages = Seq("en")),
        docs(
          GeoDoc(1, "Hron,Hronlandia", 1, t32, 0, 0,
            langTexts = Map("en" -> "Hron", "universal" -> "HO")),
          GeoDoc(2, "Holdout", 0, t32, 0, 0,
            langTexts = Map("en" -> "Holdout", "universal" -> "HT")),
          GeoDoc(3, "Usak", 100, t32, 0, 0,
            langTexts = Map("en" -> "Usak"))))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(q: String, language: Option[String] = None,
                 languageMode: String = "",
                 limitVerify: Int = 10): Seq[(String, String, Long, Double)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, index, queries,
      Forward.Options(limitVerify = limitVerify, language = language,
        languageMode = languageMode))
      .select(col("place_name"), col("place_type"), col("feature_id"),
        col("relev"))
      .as[(String, String, Long, Double)].collect().toSeq
  }

  private def leadText(pn: String): String = pn.split(",")(0).trim

  test("default text still matches") {
    val res = fw("Hron", limitVerify = 1)
    assert(leadText(res.head._1) === "Hron", s"got $res")
  }

  test("language code display") {
    val res = fw("Holdout", language = Some("en"), limitVerify = 1)
    assert(leadText(res.head._1) === "Holdout", s"got $res")
  }

  test("HO finds both the universal synonym and the autocompleted default") {
    val res = fw("HO")
    assert(res.length === 2, s"got $res")
  }

  test("HO with language=fr ranks the complete universal match first") {
    val res = fw("HO", language = Some("fr"))
    assert(res.length === 2, s"got $res")
    assert(res.head._3 === 1L && res.head._2 === "region", s"got $res")
  }

  test("universal text passes languageMode=strict") {
    val res = fw("Cerracs", language = Some("en"), languageMode = "strict")
    assert(res.nonEmpty, "no result")
    assert(leadText(res.head._1) === "Cerracs", s"got $res")
  }

  test("usa with language=en matches universal text at full relevance") {
    val res = fw("usa", language = Some("en"))
    assert(res.head._2 === "country" && res.head._3 === 2L, s"got $res")
    assert(res.head._4 === 1.0, s"got $res")
  }
}
