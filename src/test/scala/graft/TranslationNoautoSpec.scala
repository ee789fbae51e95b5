package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward
import TestGeom._

/** Ported translation-autocomplete fixtures (reference
  * test/acceptance/geocode-unit.translation-noauto.test.js): "de" prefix-
  * matches a Hungarian translation ("Dél-Karolina") with the
  * out-of-language penalty; requesting hu (or hu-HU) shows the Hungarian
  * text and drops the penalty for names identical across languages.
  */
class TranslationNoautoSpec extends AnyFunSuite with BeforeAndAfterAll {
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

    index = IndexBuilder.build(spark, Seq(
      (LayerConfig("region", idx = 0, zoom = 6, typ = "region",
        languages = Seq("en", "hu")),
        docs(
          GeoDoc(1, "South Carolina", 0, tilePoly(6, (32, 32)), 0, 0,
            langTexts = Map("en" -> "South Carolina", "hu" -> "Dél-Karolina")),
          GeoDoc(2, "Delaware", 0, tilePoly(6, (32, 32)), 0, 0,
            langTexts = Map("en" -> "Delaware", "hu" -> "Delaware"))))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(q: String, language: Option[String] = None): Seq[(String, Long, Double)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, index, queries,
      Forward.Options(language = language))
      .select(col("place_name"), col("feature_id"), col("relev"))
      .as[(String, Long, Double)].collect().toSeq
  }

  test("de: Delaware first, translated South Carolina penalized") {
    val res = fw("de")
    assert(res.length === 2, s"got $res")
    assert(res(0)._1 === "Delaware" && res(0)._2 === 2L, s"got $res")
    assert(res(1)._1 === "South Carolina" && res(1)._2 === 1L, s"got $res")
    assert(res(0)._3 > res(1)._3, s"got $res")
  }

  test("de language=en: same order, English display") {
    val res = fw("de", Some("en"))
    assert(res.length === 2, s"got $res")
    assert(res(0)._1 === "Delaware" && res(1)._1 === "South Carolina", s"got $res")
    assert(res(0)._3 > res(1)._3, s"got $res")
  }

  test("de language=hu: Hungarian display, no cross-language penalty gap") {
    val res = fw("de", Some("hu"))
    assert(res.length === 2, s"got $res")
    assert(res(0)._1 === "Delaware" && res(0)._2 === 2L, s"got $res")
    assert(res(1)._1 === "Dél-Karolina" && res(1)._2 === 1L, s"got $res")
    assert(res(0)._3 - res(1)._3 < 0.1, s"got $res")
  }

  test("de language=hu-HU resolves to hu") {
    val res = fw("de", Some("hu-HU"))
    assert(res.length === 2, s"got $res")
    assert(res(1)._1 === "Dél-Karolina", s"got $res")
  }

  test("delaware: single result") {
    val res = fw("delaware")
    assert(res.map(r => (r._1, r._2)) === Seq(("Delaware", 2L)), s"got $res")
  }

  test("sou: prefix of the default text only") {
    val res = fw("sou")
    assert(res.map(r => (r._1, r._2)) === Seq(("South Carolina", 1L)), s"got $res")
  }

  test("south carolina: exact") {
    val res = fw("south carolina")
    assert(res.map(r => (r._1, r._2)) === Seq(("South Carolina", 1L)), s"got $res")
  }

  test("del karolina: unidecoded translation matches") {
    val res = fw("del karolina")
    assert(res.map(r => (r._1, r._2)) === Seq(("South Carolina", 1L)), s"got $res")
  }
}
