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
  *  - reference test/acceptance/geocode-unit.bmask.test.js — the
  *    non_overlapping_indexes bounds mask derives from disjoint
  *    geocoder_stack sets;
  *  - geocode-unit.numeric.test.js — an all-numeric query matches postcode
  *    phrases (no address partial-number search without proximity), with
  *    the longer autocomplete phrase first on the grid-id tie.
  */
class BmaskNumericSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var numeric: IndexBuilder.CarmenIndex = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])

    val t32 = tilePoly(6, (32, 32))
    numeric = IndexBuilder.build(spark, Seq(
      (LayerConfig("postcode", idx = 0, zoom = 6, typ = "postcode"),
        docs(
          GeoDoc(1, "22209", 0, t32, 0, 0),
          GeoDoc(2, "22209 restaurant", 0, t32, 0, 0))),
      (LayerConfig("address", idx = 1, zoom = 6, typ = "address",
        geocoderAddress = true, geocoderName = "address"),
        docs(GeoDoc(2, "main st", 1000, mpt((0, 0)), 0, 0,
          addressnumber = Seq(Seq("22209")))))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(q: String, limitVerify: Int): Seq[(String, Double)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, numeric, queries,
      Forward.Options(limitVerify = limitVerify))
      .select(col("place_name"), col("relev"))
      .as[(String, Double)].collect().toSeq
  }

  test("bmask: disjoint geocoder_stack sets derive the bounds mask") {
    val derived = IndexBuilder.deriveNonOverlapping(Seq(
      LayerConfig("small", idx = 0, zoom = 6, typ = "small",
        stack = Seq("west", "east")),
      LayerConfig("west", idx = 1, zoom = 6, typ = "west",
        stack = Seq("west")),
      LayerConfig("east", idx = 2, zoom = 6, typ = "east",
        stack = Seq("east"))))
    assert(derived(0).nonOverlapping === Set.empty[Int])
    assert(derived(1).nonOverlapping === Set(2))
    assert(derived(2).nonOverlapping === Set(1))
  }

  test("numeric: 22209 matches both postcodes at relevance 1") {
    val res = fw("22209", limitVerify = 2)
    assert(res.take(2) === Seq(("22209 restaurant", 1.0), ("22209", 1.0)),
      s"got $res")
  }

  test("numeric: 222 degen match returns a result") {
    val res = fw("222", limitVerify = 1)
    assert(res.length === 1, s"got $res")
  }

  test("numeric: 22209 rest autocompletes the restaurant") {
    val res = fw("22209 rest", limitVerify = 2)
    assert(res.head._1 === "22209 restaurant", s"got $res")
  }
}
