package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward
import TestGeom._

/** Ported fixtures:
  *
  *  - reference test/acceptance/geocode-unit.address-vs-postcode.test.js —
  *    "Quincy MA 02169" prefers the postcode/place/region stack over the
  *    same-number address in the other Quincy, and "0216" autocompletes to
  *    the postcode;
  *  - geocode-unit.address-preferred-order.test.js — with
  *    geocoder_expected_number_order=first the first-position housenumber
  *    is selected when two numbers appear, with the 0.633333 coverage
  *    penalty; a trailing number alone takes only the order penalty.
  */
class AddressOrderSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var quincy: IndexBuilder.CarmenIndex = _
  private var order: IndexBuilder.CarmenIndex = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])

    quincy = IndexBuilder.build(spark, Seq(
      (LayerConfig("region", idx = 0, zoom = 6, typ = "region"),
        docs(
          GeoDoc(1, "Massachusetts, MA", 0, mpt((10, 0)), 10, 0),
          GeoDoc(2, "Illinois, IL", 0, mpt((0, 0)), 0, 0))),
      (LayerConfig("place", idx = 1, zoom = 6, typ = "place"),
        docs(
          GeoDoc(1, "Quincy", 0, mpt((0, 0)), 0, 0),
          GeoDoc(2, "Quincy", 0, mpt((10, 0)), 10, 0))),
      (LayerConfig("postcode", idx = 2, zoom = 6, typ = "postcode"),
        docs(GeoDoc(1, "02169", 0, mpt((10, 0)), 10, 0))),
      (LayerConfig("address", idx = 3, zoom = 6, typ = "address",
        geocoderAddress = true),
        docs(GeoDoc(1, "Maine St", 0, mpt((0, 0)), 0, 0,
          addressnumber = Seq(Seq("02169")))))))

    order = IndexBuilder.build(spark, Seq(
      (LayerConfig("address", idx = 0, zoom = 6, typ = "address",
        geocoderAddress = true, geocoderName = "address",
        expectedNumberOrder = "first"),
        docs(GeoDoc(12345, "15th Street Northeast", 1,
          mpt((-76.9, 38.8), (-76.91, 38.81)), -76.905, 38.805,
          addressnumber = Seq(Seq("522", "541")))))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(idx: IndexBuilder.CarmenIndex, q: String): Seq[(String, Long, Double)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, idx, queries)
      .select(col("place_name"), col("feature_id"), col("relev"))
      .as[(String, Long, Double)].collect().toSeq
  }

  test("Quincy MA 02169 prefers the postcode stack") {
    val res = fw(quincy, "Quincy MA 02169")
    assert(res.head._1 === "02169, Quincy, Massachusetts", s"got $res")
  }

  test("0216 autocompletes to the postcode") {
    val res = fw(quincy, "0216")
    assert(res.head._1 === "02169, Quincy, Massachusetts", s"got $res")
  }

  test("541 ... #522 selects the first-position number at 0.633333") {
    val res = fw(order, "541 15th Street Northeast #522")
    assert(res.length === 1, s"got $res")
    assert(res.head._1.startsWith("541 "), s"got $res")
    assert(math.abs(res.head._3 - 0.633333) < 1e-6, s"got $res")
  }

  test("522 ... #541 selects the first-position number at 0.633333") {
    val res = fw(order, "522 15th Street Northeast #541")
    assert(res.length === 1, s"got $res")
    assert(res.head._1.startsWith("522 "), s"got $res")
    assert(math.abs(res.head._3 - 0.633333) < 1e-6, s"got $res")
  }

  test("541 alone leading keeps full relevance") {
    val res = fw(order, "541 15th Street Northeast")
    assert(res.length === 1, s"got $res")
    assert(res.head._1.startsWith("541 "), s"got $res")
    assert(res.head._3 === 1.0, s"got $res")
  }

  test("541 alone trailing takes only the order penalty") {
    val res = fw(order, "15th Street Northeast 541")
    assert(res.length === 1, s"got $res")
    assert(res.head._1.startsWith("541 "), s"got $res")
    assert(res.head._3 > 0.5 && res.head._3 < 1.0, s"got $res")
  }
}
