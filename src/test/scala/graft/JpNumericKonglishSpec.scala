package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward
import TestGeom._

/** Ported CJK/language-fallback stress fixtures:
  *
  *  - reference test/acceptance/geocode-unit.jp-numeric.test.js — a fused
  *    trailing house number in a CJK query ("神明台三丁目5") splits and
  *    resolves against the cluster;
  *  - geocode-unit.konglish.test.js — score ordering across features with
  *    partial translation coverage holds for untranslated request
  *    languages (ko/ar fall back without dropping results).
  */
class JpNumericKonglishSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var jp: IndexBuilder.CarmenIndex = _
  private var sf: IndexBuilder.CarmenIndex = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])

    val t32 = tilePoly(6, (32, 32))
    jp = IndexBuilder.build(spark, Seq(
      (LayerConfig("country", idx = 0, zoom = 6, typ = "country"),
        docs(GeoDoc(1, "Japan", 0, t32, 0, 0))),
      (LayerConfig("region", idx = 1, zoom = 6, typ = "region"),
        docs(GeoDoc(1, "東京都", 0, t32, 0, 0))),
      (LayerConfig("place", idx = 2, zoom = 6, typ = "place"),
        docs(GeoDoc(1, "羽村市", 0, t32, 0, 0))),
      (LayerConfig("address", idx = 3, zoom = 6, typ = "address",
        geocoderAddress = true),
        docs(GeoDoc(1, "神明台三丁目", 0, mpt((0, 0), (0, 0)), 0, 0,
          addressnumber = Seq(Seq("3", "5")))))))

    sf = IndexBuilder.build(spark, Seq(
      (LayerConfig("place", idx = 0, zoom = 6, typ = "place",
        languages = Seq("en", "ko", "ar", "es")),
        docs(
          GeoDoc(1, "San Francisco", 10, pt(1, 1), 1, 1,
            langTexts = Map(
              "ar" -> "مقاطعة سان فرانسيسكو، كاليفورنيا",
              "en" -> "San Francisco",
              "ko" -> "샌프란시스코")),
          GeoDoc(2, "San Francisco", 5, pt(80, -10), 80, -10,
            langTexts = Map("es" -> "San Francisco")),
          GeoDoc(3, "San Francisco", 5, pt(-80, -10), -80, -10,
            langTexts = Map("en" -> "San Francisco")))),
      (LayerConfig("neighborhood", idx = 1, zoom = 6, typ = "neighborhood"),
        docs(GeoDoc(3, "San Francisco", 0, pt(100, -20), 100, -20)))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(idx: IndexBuilder.CarmenIndex, q: String,
                 language: Option[String] = None): Seq[(String, Long)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, idx, queries,
      Forward.Options(language = language))
      .select(col("place_name"), col("feature_id"))
      .as[(String, Long)].collect().toSeq
  }

  test("jp-numeric: fused trailing number resolves") {
    val res = fw(jp, "神明台三丁目5")
    assert(res.length === 1, s"got $res")
    assert(res.head._1.contains("5"), s"got $res")
  }

  test("jp-numeric: separated number resolves") {
    val res = fw(jp, "神明台三丁目 5")
    assert(res.length === 1, s"got $res")
    assert(res.head._1.contains("5"), s"got $res")
  }

  test("konglish: score order without language") {
    val res = fw(sf, "San Francisco")
    assert(res.head._2 === 1L, s"got $res")
  }

  test("konglish: language=en keeps SF CA first") {
    val res = fw(sf, "San Francisco", Some("en"))
    assert(res.head._2 === 1L, s"got $res")
  }

  test("konglish: untranslated ko falls back without dropping results") {
    val res = fw(sf, "San Francisco", Some("ko"))
    assert(res.length >= 2, s"got $res")
    assert(res(0)._2 === 1L && res(1)._2 === 2L, s"got $res")
  }

  test("konglish: untranslated ar falls back without dropping results") {
    val res = fw(sf, "San Francisco", Some("ar"))
    assert(res.length >= 2, s"got $res")
    assert(res(0)._2 === 1L && res(1)._2 === 2L, s"got $res")
  }
}
