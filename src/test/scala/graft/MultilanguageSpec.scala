package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward
import TestGeom._

/** Ported multilanguage fixtures (reference
  * test/acceptance/geocode-unit.multilanguage.test.js): a comma-separated
  * language request yields one place_name per language, each assembled
  * with that language's geocoder_format_{lang} template; the request list
  * is validated (max 20, unique, known codes).
  */
class MultilanguageSpec extends AnyFunSuite with BeforeAndAfterAll {
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
        geocoderName = "country"),
        docs(GeoDoc(1, "France", 0, t32, 0, 0,
          langTexts = Map("en" -> "France", "es" -> "Francia",
            "ja" -> "フランス")))),
      (LayerConfig("place", idx = 1, zoom = 6, typ = "place",
        geocoderName = "place",
        geocoderFormats = Map(
          "es" -> "{{place.name}} {{country.name}}",
          "ja" -> "{{country.name}} {{place.name}}")),
        docs(GeoDoc(1, "Paris", 0, t32, 0, 0,
          langTexts = Map("en" -> "Paris", "es" -> "París",
            "ja" -> "パリ"))))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("language list validation: bogus code") {
    val err = Forward.validateOptions(index,
      Forward.Options(language = Some("en,es,bogus")))
    assert(err === Some("'bogus' is not a valid language code"))
  }

  test("language list validation: more than 20") {
    val err = Forward.validateOptions(index, Forward.Options(language =
      Some("ab,af,ak,sq,am,ar,an,hy,as,av,ae,ay,az,ba,bm,eu,be,bn,bh,bi,bo,bs")))
    assert(err === Some("options.language should be a list of no more than 20 languages"))
  }

  test("language list validation: duplicates") {
    val err = Forward.validateOptions(index,
      Forward.Options(language = Some("en,en")))
    assert(err === Some("options.language should be a list of unique language codes"))
  }

  test("paris language=en,es,ja yields per-language place names") {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, "paris")).toDF("query_id", "query")
    val res = Forward.forward(spark, index, queries,
      Forward.Options(limitVerify = 1, language = Some("en,es,ja")))
      .select(col("place_name"), col("feature_id"), col("place_type"),
        col("place_names"))
      .as[(String, Long, String, Map[String, String])].collect().toSeq
    // 'en' has no configured format; closest-lang display fallback
    // (en -> es) selects the es template, as the reference asserts
    // (place_name_en === 'Paris France')
    assert(res.head._1 === "Paris France", s"got $res")
    assert(res.head._2 === 1L && res.head._3 === "place", s"got $res")
    val names = res.head._4
    assert(names.get("en") === Some("Paris France"), s"got $names")
    assert(names.get("es") === Some("París Francia"), s"got $names")
    assert(names.get("ja") === Some("フランス パリ"), s"got $names")
  }
}
