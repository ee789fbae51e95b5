package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Reverse
import TestGeom._

/** Ported geocoder_type reverse fixtures (reference
  * test/acceptance/geocode-unit.geocoder_type.test.js): type filters on
  * reverse queries, geocoder_name+geocoder_type conflict-key claiming
  * (a closer address replaces the poi that claimed its conflict slot),
  * and overlapping identical polygons resolving by id.
  */
class GeocoderTypeSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var plain: IndexBuilder.CarmenIndex = _    // part 1: distinct names
  private var named: IndexBuilder.CarmenIndex = _    // part 2: shared gname
  private var near: IndexBuilder.CarmenIndex = _     // part 3: poi 10m away
  private var overlap: IndexBuilder.CarmenIndex = _  // part 4: same polygons

  private val addrPt = (-77.04312264919281, 38.91041215085371)
  private val poiFar = (-77.04441547393799, 38.909427030614665)
  private val poiNear = (-77.04320579767227, 38.910435109001334)

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])

    def addrDoc = GeoDoc(1, "fake street", 0, mpt(addrPt), addrPt._1, addrPt._2,
      addressnumber = Seq(Seq("100")))
    def poiDoc(at: (Double, Double)) =
      GeoDoc(1, "big bank", 0, pt(at._1, at._2), at._1, at._2)

    plain = IndexBuilder.build(spark, Seq(
      (LayerConfig("address", idx = 0, zoom = 12, typ = "address",
        geocoderAddress = true), docs(addrDoc)),
      (LayerConfig("poi", idx = 1, zoom = 12, typ = "poi"),
        docs(poiDoc(poiFar)))))

    named = IndexBuilder.build(spark, Seq(
      (LayerConfig("address", idx = 0, zoom = 12, typ = "address",
        geocoderAddress = true, geocoderName = "address"), docs(addrDoc)),
      (LayerConfig("poi", idx = 1, zoom = 12, typ = "poi",
        geocoderName = "address"), docs(poiDoc(poiFar)))))

    near = IndexBuilder.build(spark, Seq(
      (LayerConfig("address", idx = 0, zoom = 12, typ = "address",
        geocoderAddress = true, geocoderName = "address"), docs(addrDoc)),
      (LayerConfig("poi", idx = 1, zoom = 12, typ = "poi",
        geocoderName = "address"), docs(poiDoc(poiNear)))))

    val ring = poly(-77.0387077331543, 38.90803281165565,
      -77.02815055847168, 38.91167275087875)
    overlap = IndexBuilder.build(spark, Seq(
      (LayerConfig("place", idx = 0, zoom = 12, typ = "place"),
        docs(
          GeoDoc(1, "Logan Circle", 0, ring,
            -77.03463077545165, 38.90976931970528),
          GeoDoc(2, "Dupont Circle", 0, ring,
            -77.04342842102051, 38.90963574367117)))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def rev(idx: IndexBuilder.CarmenIndex, at: (Double, Double),
                  types: Seq[String] = Nil): Seq[(String, Double)] = {
    val sp = spark; import sp.implicits._
    val pts = Seq((1L, at._1, at._2)).toDF("query_id", "lon", "lat")
    Reverse.reverseWithOptions(spark, idx, pts,
      Reverse.ReverseOptions(types = types))
      .select(col("place_name"), lit(1.0))
      .as[(String, Double)].collect().toSeq
  }

  // part 1: distinct geocoder_names

  test("plain: reverse at address returns poi-led context (index order)") {
    val res = rev(plain, addrPt)
    assert(res.head._1 === "big bank, fake street", s"got $res")
  }

  test("plain: types=poi keeps the poi with address context") {
    val res = rev(plain, addrPt, types = Seq("poi"))
    assert(res.head._1 === "big bank, fake street", s"got $res")
  }

  test("plain: types=address at the poi point returns the address") {
    val res = rev(plain, poiFar, types = Seq("address"))
    assert(res.head._1 === "100 fake street", s"got $res")
  }

  // part 2: shared geocoder_name, distinct geocoder_type

  test("named: address query returns address (closer replaces conflict claim)") {
    val res = rev(named, addrPt)
    assert(res.head._1 === "100 fake street", s"got $res")
  }

  test("named: poi query returns poi") {
    val res = rev(named, poiFar)
    assert(res.head._1 === "big bank", s"got $res")
  }

  test("named: types=poi at the address point returns only the poi") {
    val res = rev(named, addrPt, types = Seq("poi"))
    assert(res.length === 1 && res.head._1 === "big bank", s"got $res")
  }

  test("named: types=address at the poi point returns only the address") {
    val res = rev(named, poiFar, types = Seq("address"))
    assert(res.length === 1 && res.head._1 === "100 fake street", s"got $res")
  }

  // part 3: poi within a few meters

  test("near: type filter removes the address, poi stays") {
    val res = rev(near, poiNear, types = Seq("poi"))
    assert(res.length === 1 && res.head._1 === "big bank", s"got $res")
  }

  test("near: type filter removes the poi, address stays") {
    val res = rev(near, addrPt, types = Seq("address"))
    assert(res.length === 1 && res.head._1 === "100 fake street", s"got $res")
  }

  // part 4: overlapping identical polygons

  test("overlapping places: lowest id wins the direct-hit tie") {
    val res = rev(overlap, (-77.0378065109253, 38.909836107628074))
    assert(res.head._1 === "Logan Circle", s"got $res")
  }
}
