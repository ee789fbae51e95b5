package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward

/** Ported partial-number proximity fixtures (reference
  * test/acceptance/geocode-unit.address-partial-number.js): a bare-number
  * query with a proximity point inside an address index's bounds runs a
  * prefix search over clusters (C8 x300 boost + nearby-only grids); out-of-
  * bounds proximity and ITP-only features yield nothing.
  */
class PartialNumberAcceptanceSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var index: IndexBuilder.CarmenIndex = _

  private def gcPoints(pts: Seq[(Double, Double)]): String =
    s"""{"type":"GeometryCollection","geometries":[{"type":"MultiPoint","coordinates":[${
      pts.map(p => s"[${p._1},${p._2}]").mkString(",")}]}]}"""

  // subset of the reference's fr_sample cluster around (2.74, 47.98)
  private val frNumbers = Seq("9", "35", "51", "63", "71", "85", "97", "100",
    "131", "166", "382", "406", "504", "540", "577", "633", "688", "735",
    "753", "5000")
  private val frCoords = frNumbers.indices.map(i =>
    (2.7370 + i * 0.0003, 47.9750 + i * 0.0001))

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])
    val frBounds = Seq(2.73, 47.97, 2.75, 47.99)
    // the reference's US extent: an antimeridian-crossing bounding box
    val usBounds = Seq(173.1329215, 18.9198449, -101.696897, 71.3567692)
    index = IndexBuilder.build(spark, Seq(
      (LayerConfig("fr_address", idx = 0, zoom = 6, typ = "address",
        geocoderAddress = true, bounds = frBounds),
        docs(GeoDoc(395484891L, "Route De Saint-Firmin Des Vignes,Rue De Saint-Firmin Des Vignes",
          0, gcPoints(frCoords), 2.738896, 47.976618,
          addressnumber = Seq(frNumbers)))),
      (LayerConfig("us_address", idx = 1, zoom = 6, typ = "address",
        geocoderAddress = true, bounds = usBounds),
        docs(
          GeoDoc(1, "Evergreen Terrace", 0, gcPoints(Seq((-121.0, 40.0))),
            -121.0, 40.0, addressnumber = Seq(Seq("742"))),
          GeoDoc(12, "Main St", 0,
            """{"type":"GeometryCollection","geometries":[{"type":"MultiLineString","coordinates":[[[-121,40],[-121,41]],[[-121,45],[-121,46]]]}]}""",
            0.0, 10.0,
            rangetype = "tiger",
            lfromhn = Seq(Seq("1002", "2")), ltohn = Seq(Seq("1998", "1000")),
            rfromhn = Seq(Seq("1001", "1")), rtohn = Seq(Seq("1999", "999")),
            parityl = Seq(Seq("E", "E")), parityr = Seq(Seq("O", "O")))))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(q: String, prox: (Double, Double)): Seq[(Int, String, Long)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, index, queries,
      Forward.Options(proximity = Some(prox)))
      .select(col("rank"), col("place_name"), col("feature_id"))
      .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
  }

  test("bare number with in-bounds proximity prefix-matches the fr cluster") {
    val res = fw("7", (2.73737, 47.977057))
    assert(res.length === 1, s"only one result: $res")
    assert(res.head._3 === 395484891L, s"fr cluster: $res")
    assert(res.head._2.split(" ")(0).startsWith("7"), s"prefix 7: $res")
  }

  test("bare number with US proximity matches the US cluster, not far ITP") {
    val res = fw("7", (-121.0, 40.0))
    assert(res.length === 1, s"only one result: $res")
    assert(res.head._3 === 1L, s"Evergreen Terrace: $res")
    assert(res.head._2.startsWith("742"), s"prefix 7 -> 742: $res")
  }

  test("bare number with out-of-bounds proximity returns nothing") {
    val res = fw("7", (-50.0, -50.0))
    assert(res.isEmpty, s"got $res")
  }

  test("bare number with no matching prefix returns nothing") {
    val res = fw("76", (2.73737, 47.977057))
    assert(res.isEmpty, s"got $res")
  }
}
