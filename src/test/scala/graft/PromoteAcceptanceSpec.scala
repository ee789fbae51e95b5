package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward

/** Ported promotion acceptance fixtures:
  *
  *  - reference test/acceptance/geocode-unit.promote-score.test.js —
  *    geocoder_inherit_score promotes an identically-named nested feature
  *    (georgia place inside georgia country) and bumps addresses inside the
  *    squishy feature ahead of equally-relevant siblings;
  *  - geocode-unit.promote-language.test.js — identically-named features
  *    promote the deepest; language-mismatch 0.96 penalty applies only when
  *    the requested language has no fallback translation, and a
  *    carmen:text_en match works when the default text differs.
  */
class PromoteAcceptanceSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var score: IndexBuilder.CarmenIndex = _
  private var lang: IndexBuilder.CarmenIndex = _
  private var makkah: IndexBuilder.CarmenIndex = _

  private def poly(w: Double, s: Double, e: Double, n: Double): String =
    s"""{"type":"Polygon","coordinates":[[[$w,$s],[$w,$n],[$e,$n],[$e,$s],[$w,$s]]]}"""
  private def mpt(pts: (Double, Double)*): String =
    pts.map { case (x, y) => s"[$x,$y]" }
      .mkString("""{"type":"MultiPoint","coordinates":[""", ",", "]}")

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])

    score = IndexBuilder.build(spark, Seq(
      (LayerConfig("country", idx = 0, zoom = 6, typ = "country",
        languages = Seq("en")),
        docs(
          GeoDoc(1, "usa", 1000000, poly(-20, -20, 20, 20), 0, 0,
            langTexts = Map("en" -> "usa")),
          GeoDoc(2, "georgia", 10, poly(40, 40, 50, 50), 45, 45))),
      (LayerConfig("region", idx = 1, zoom = 6, typ = "region",
        languages = Seq("en")),
        docs(GeoDoc(1, "georgia", 50, poly(-20, -20, 20, 20), 0, 0))),
      (LayerConfig("place", idx = 2, zoom = 6, typ = "place",
        languages = Seq("en"), geocoderInheritScore = true),
        docs(GeoDoc(1, "georgia", 1, poly(42, 42, 48, 48), 45, 45))),
      (LayerConfig("address", idx = 3, zoom = 14, typ = "address",
        languages = Seq("en"), geocoderAddress = true),
        docs(
          GeoDoc(10, "Main St", 0, mpt((0, 0)), 0, 0,
            addressnumber = Seq(Seq("1"))),
          GeoDoc(11, "Main St", 0, mpt((45, 45)), 45, 45,
            addressnumber = Seq(Seq("1"))),
          GeoDoc(12, "Main St", 0, mpt((41, 41)), 41, 41,
            addressnumber = Seq(Seq("1")))))))

    lang = IndexBuilder.build(spark, Seq(
      (LayerConfig("country", idx = 0, zoom = 6, typ = "country",
        languages = Seq("en", "es")),
        docs(GeoDoc(1, "usa", 1, poly(-20, -20, 20, 20), 0, 0,
          langTexts = Map("en" -> "usa")))),
      (LayerConfig("region", idx = 1, zoom = 6, typ = "region",
        languages = Seq("en", "es")),
        docs(GeoDoc(1, "state of new york, new york", 1,
          poly(-20, -20, 20, 20), 0, 0,
          langTexts = Map("es" -> "nueva york")))),
      (LayerConfig("place", idx = 2, zoom = 6, typ = "place",
        languages = Seq("en", "es"), geocoderInheritScore = true),
        docs(GeoDoc(1, "new york", 1, poly(-20, -20, 20, 20), 0, 0,
          langTexts = Map("es" -> "nueva york"))))))

    makkah = IndexBuilder.build(spark, Seq(
      (LayerConfig("country", idx = 0, zoom = 6, typ = "country",
        languages = Seq("en", "es")),
        docs(GeoDoc(1, "saudi arabia", 1, poly(-20, -20, 20, 20), 0, 0))),
      (LayerConfig("region", idx = 1, zoom = 6, typ = "region",
        languages = Seq("en", "es")),
        docs(GeoDoc(1, "مكة", 1, poly(-20, -20, 20, 20), 0, 0,
          langTexts = Map("en" -> "Makkah")))),
      (LayerConfig("place", idx = 2, zoom = 6, typ = "place",
        languages = Seq("en", "es"), geocoderInheritScore = true),
        docs(GeoDoc(1, "Makkah Al Mukarramah", 1, poly(-20, -20, 20, 20), 0, 0,
          langTexts = Map("en" -> "Makkah"))))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(idx: IndexBuilder.CarmenIndex, q: String,
                 opts: Forward.Options = Forward.Options()): Seq[(String, String, Long, Double)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, idx, queries, opts)
      .select(col("place_name"), col("place_type"), col("feature_id"),
        col("relev"))
      .as[(String, String, Long, Double)].collect().toSeq
  }

  // --- promote-score.test.js ---

  test("promote-score: georgia promotes the high-scored region") {
    val res = fw(score, "georgia")
    assert(res.head._2 === "region" && res.head._3 === 1L, s"got $res")
    assert(res.head._4 === 1.0, s"got $res")
  }

  test("promote-score: 1 main st georgia - squishy address first, all three back") {
    val res = fw(score, "1 main st georgia")
    assert(res.count(_._2 == "address") === 3, s"got $res")
    assert(res.head._2 === "address" && res.head._3 === 11L, s"got $res")
    assert(res.head._4 === 1.0, s"got $res")
  }

  // --- promote-language.test.js ---

  test("promote-language: new york usa promotes the place") {
    val res = fw(lang, "new york usa")
    assert(res.head._2 === "place" && res.head._3 === 1L, s"got $res")
    assert(res.head._4 === 1.0, s"got $res")
  }

  test("promote-language: nueva york usa in es carries the untranslated-usa penalty") {
    val res = fw(lang, "nueva york usa", Forward.Options(language = Some("es")))
    assert(res.head._2 === "place" && res.head._3 === 1L, s"got $res")
    assert(math.abs(res.head._4 - 0.982963) < 1e-6, s"got $res")
  }

  test("promote-language: nueva york in ca falls back to es at full relevance") {
    val res = fw(lang, "nueva york", Forward.Options(language = Some("ca")))
    assert(res.head._2 === "place" && res.head._3 === 1L, s"got $res")
    assert(res.head._4 === 1.0, s"got $res")
  }

  test("promote-language: makkah matches via carmen:text_en") {
    val res = fw(makkah, "makkah")
    assert(res.head._2 === "place" && res.head._3 === 1L, s"got $res")
    assert(res.head._4 === 1.0, s"got $res")
  }
}
