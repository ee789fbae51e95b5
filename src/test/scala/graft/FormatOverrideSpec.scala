package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward
import TestGeom._

/** Ported per-feature format fixtures (reference
  * test/acceptance/geocode-unit.format-override.test.js): a feature's
  * carmen:format / carmen:format_{lang} template overrides the layer
  * default, with closest-language selection (en-US -> format_en).
  */
class FormatOverrideSpec extends AnyFunSuite with BeforeAndAfterAll {
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
      (LayerConfig("country", idx = 0, zoom = 6, typ = "country"),
        docs(GeoDoc(4, "america", 0, pt(0, 0), 0, 0))),
      (LayerConfig("postcode", idx = 1, zoom = 6, typ = "postcode"),
        docs(GeoDoc(3, "12345", 0, pt(0, 0), 0, 0,
          overrides = Map("format" -> "Z {{postcode.name}}, {{country.name}}")))),
      (LayerConfig("address", idx = 2, zoom = 6, typ = "address",
        geocoderAddress = true),
        docs(
          GeoDoc(1, "fake street", 0, mpt((0, 0), (0, 0), (0, 0)), 0, 0,
            addressnumber = Seq(Seq("9B", "10C", "7")),
            overrides = Map(
              "format" -> "X {{address.number}} {{address.name}}, {{postcode.name}}, {{country.name}}",
              "format_en" -> "Y {{address.number}} {{address.name}}, {{postcode.name}}, {{country.name}}")),
          GeoDoc(2, "other street", 0, mpt((0, 0), (0, 0), (0, 0)), 0, 0,
            addressnumber = Seq(Seq("9B", "10C", "7")))))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(q: String, language: Option[String] = None): Seq[String] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, index, queries,
      Forward.Options(limitVerify = 1, language = language))
      .select(col("place_name")).as[String].collect().toSeq
  }

  test("feature carmen:format overrides the default address template") {
    val res = fw("9b fake street")
    assert(res.head === "X 9b fake street, 12345, america", s"got $res")
  }

  test("a feature without carmen:format keeps the default template") {
    val res = fw("9b other street")
    assert(res.head === "9b other street, 12345, america", s"got $res")
  }

  test("carmen:format_en wins under language=en") {
    val res = fw("9b fake street", language = Some("en"))
    assert(res.head === "Y 9b fake street, 12345, america", s"got $res")
  }

  test("approximate language en-US resolves to format_en") {
    val res = fw("9b fake street", language = Some("en-US"))
    assert(res.head === "Y 9b fake street, 12345, america", s"got $res")
  }

  test("postcode carmen:format override") {
    val res = fw("12345")
    assert(res.head === "Z 12345, america", s"got $res")
  }
}
