package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward
import TestGeom._

/** Ported local-text fixtures (reference
  * test/acceptance/geocode-unit.localtext.test.js): language synonyms are
  * indexed and matchable, the 0.96 out-of-language penalty applies without
  * a language flag, matching_text recovers the matched synonym, and an
  * invalid carmen:text_{lang} code is rejected at index time with the
  * reference error string.
  */
class LocaltextSpec extends AnyFunSuite with BeforeAndAfterAll {
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

    val t30 = tilePoly(6, (30, 30))
    index = IndexBuilder.build(spark, Seq(
      (LayerConfig("country", idx = 0, zoom = 6, typ = "country",
        languages = Seq("es", "ru", "zh_Latn")),
        docs(GeoDoc(2, "Russian Federation, Rossiyskaya Federatsiya", 0,
          t30, 0, 0,
          langTexts = Map("ru" -> "Российская Федерация",
            "zh_Latn" -> "Elousi")))),
      (LayerConfig("region", idx = 1, zoom = 6, typ = "region",
        languages = Seq("es", "ru", "zh_Latn")),
        docs(GeoDoc(2, "Northwestern Federal District,  Severo-Zapadny federalny okrug",
          0, t30, 0, 0)))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(q: String, language: Option[String] = None): Seq[(String, Long, Double, String)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, index, queries,
      Forward.Options(limitVerify = 1, language = language))
      .select(col("place_name"), col("feature_id"), col("relev"),
        coalesce(col("matching_text"), lit("")))
      .as[(String, Long, Double, String)].collect().toSeq
  }

  test("russia => Russian Federation") {
    val res = fw("russia")
    assert(res.head._1 === "Russian Federation" && res.head._2 === 2L, s"got $res")
  }

  test("Rossiyskaya => Russian Federation with matching_text synonym") {
    val res = fw("Rossiyskaya")
    assert(res.head._1 === "Russian Federation" && res.head._2 === 2L, s"got $res")
    assert(res.head._4 === "Rossiyskaya Federatsiya", s"got $res")
  }

  test("Российская without language flag carries the 0.96 penalty") {
    val res = fw("Российская")
    assert(res.length === 1, s"got $res")
    assert(res.head._1 === "Russian Federation", s"got $res")
    assert(res.head._3 <= 0.96, s"got $res")
  }

  test("Российская with language=ru displays Russian text at full relevance") {
    val res = fw("Российская", language = Some("ru"))
    assert(res.length === 1, s"got $res")
    assert(res.head._1 === "Российская Федерация", s"got $res")
    assert(res.head._3 > 0.9, s"got $res")
  }

  test("Российская Федерация => Russian Federation") {
    val res = fw("Российская Федерация")
    assert(res.head._1 === "Russian Federation" && res.head._2 === 2L, s"got $res")
  }

  test("Elousi (zh_Latn IETF synonym) => Russian Federation") {
    val res = fw("Elousi")
    assert(res.head._1 === "Russian Federation" && res.head._2 === 2L, s"got $res")
  }

  test("fake blah blah => no result") {
    assert(fw("fake blah blah").isEmpty)
  }

  test("invalid carmen:text_{lang} code is quarantined with the reference error") {
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])
    val bad = IndexBuilder.build(spark, Seq(
      (LayerConfig("region", idx = 0, zoom = 6, typ = "region",
        languages = Seq("es", "ru", "zh_Latn")),
        docs(GeoDoc(2, "Northwestern Federal District", 0,
          tilePoly(6, (30, 30)), 0, 0,
          langTexts = Map("fake" -> "beetlejuice"))))))
    val sp2 = spark; import sp2.implicits._
    val errs = bad.layers.head.quarantine.select(col("error"))
      .as[String].collect().toSeq
    assert(errs === Seq("fake is an invalid language code"), s"got $errs")
    val queries = Seq((1L, "beetlejuice")).toDF("query_id", "query")
    val res = Forward.forward(spark, bad, queries).collect()
    assert(res.isEmpty, s"got ${res.toSeq}")
  }
}
