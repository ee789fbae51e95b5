package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.TokenSpec
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward
import TestGeom._

/** Ported fixtures:
  *
  *  - reference test/acceptance/geocode-unit.dataterm-only.test.js — a
  *    bare house number never matches an address whose only text is a
  *    dataterm placeholder;
  *  - geocode-unit.unicode-replace.test.js — a geocoder_token whose key
  *    carries diacritics matches in all three spellings;
  *  - geocode-unit.dataterm-vs-postcode.test.js — "2000 Austria" prefers
  *    the postcode+country stack over 19 same-number address stacks.
  */
class MiscAddressSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var dataterm: IndexBuilder.CarmenIndex = _
  private var marechal: IndexBuilder.CarmenIndex = _
  private var postcode: IndexBuilder.CarmenIndex = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])

    dataterm = IndexBuilder.build(spark, Seq(
      (LayerConfig("address", idx = 0, zoom = 6, typ = "address",
        geocoderAddress = true, geocoderName = "address"),
        docs(GeoDoc(100, "-", 0, mpt((0, 0)), 0, 0,
          addressnumber = Seq(Seq("100")))))))

    marechal = IndexBuilder.build(spark, Seq(
      (LayerConfig("test", idx = 0, zoom = 6, typ = "test",
        geocoderTokens = Seq("Maréchal" -> TokenSpec("Mal"))),
        docs(GeoDoc(1, "Maréchal", 0, tilePoly(6, (32, 32)), 0, 0)))))

    val t32 = tilePoly(6, (32, 32))
    val t33 = tilePoly(6, (33, 32))
    postcode = IndexBuilder.build(spark, Seq(
      (LayerConfig("country", idx = 0, zoom = 6, typ = "country",
        geocoderName = "country"),
        docs(GeoDoc(1, "Austria", 0, t33, 360.0 / 64 + 0.001, 0))),
      (LayerConfig("postcode", idx = 1, zoom = 6, typ = "postcode",
        geocoderName = "postcode"),
        docs(GeoDoc(1, "2000", 0, t33, 360.0 / 64 + 0.001, 0))),
      (LayerConfig("address", idx = 2, zoom = 6, typ = "address",
        geocoderAddress = true, geocoderName = "address"),
        docs((1 until 20).map(i =>
          GeoDoc(i, "Austria St", 0, t32, i, 0,
            addressnumber = Seq(Seq("2000")))): _*))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(idx: IndexBuilder.CarmenIndex, q: String,
                 limitVerify: Int = 1): Seq[(String, String, Long)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, idx, queries,
      Forward.Options(limitVerify = limitVerify))
      .select(col("place_name"), col("place_type"), col("feature_id"))
      .as[(String, String, Long)].collect().toSeq
  }

  test("dataterm-only: a bare number finds nothing") {
    assert(fw(dataterm, "100").isEmpty)
  }

  test("unicode-replace: Mal => Maréchal") {
    assert(fw(marechal, "Mal").head._1 === "Maréchal")
  }

  test("unicode-replace: Maréchal => Maréchal") {
    assert(fw(marechal, "Maréchal").head._1 === "Maréchal")
  }

  test("unicode-replace: Marechal => Maréchal") {
    assert(fw(marechal, "Marechal").head._1 === "Maréchal")
  }

  test("dataterm-vs-postcode: 2000 Austria prefers the postcode stack") {
    val res = fw(postcode, "2000 Austria", limitVerify = 5)
    assert(res.head._2 === "postcode" && res.head._3 === 1L, s"got $res")
  }
}
