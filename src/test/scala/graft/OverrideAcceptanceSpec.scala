package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward

/** Ported override:{type} acceptance fixtures (reference
  * test/acceptance/geocode-unit.override.test.js): carmen:addressprops
  * per-address overrides replace the recalled context element (V11).
  */
class OverrideAcceptanceSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var index: IndexBuilder.CarmenIndex = _

  private def pt(lon: Double, lat: Double): String =
    s"""{"type":"Point","coordinates":[$lon,$lat]}"""

  private def gcPoints(pts: Seq[(Double, Double)]): String =
    s"""{"type":"GeometryCollection","geometries":[{"type":"MultiPoint","coordinates":[${
      pts.map(p => s"[${p._1},${p._2}]").mkString(",")}]}]}"""

  // the reference fixture's zxy-only place feature becomes the TILE polygon
  // in the vector tile (addfeature test path) — model it as a polygon
  private def poly(w: Double, s: Double, e: Double, n: Double): String =
    s"""{"type":"Polygon","coordinates":[[[$w,$s],[$e,$s],[$e,$n],[$w,$n],[$w,$s]]]}"""

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])
    index = IndexBuilder.build(spark, Seq(
      (LayerConfig("postcode", idx = 0, zoom = 6, typ = "postcode"),
        docs(
          GeoDoc(1, "20001", 100, pt(0.05, -0.05), 0.05, -0.05),
          GeoDoc(2, "20002", 100, pt(6.0, -0.05), 6.0, -0.05),
          GeoDoc(3, "20003", 100, pt(0.05, -6.0), 0.05, -6.0))),
      (LayerConfig("place", idx = 1, zoom = 6, typ = "place"),
        docs(GeoDoc(4, "Parker", 200, poly(-0.5, -5.0, 5.0, 0.1), 3, -3))),
      (LayerConfig("address", idx = 2, zoom = 6, typ = "address",
        geocoderAddress = true,
        geocoderFormat = "{{address.number}} {{address.name}} {{place.name}} {{postcode.name}}"),
        docs(GeoDoc(5, "fake street", 0,
          gcPoints(Seq((0.05, -0.049), (0.05, -0.05), (0.05, -0.051))),
          0.05, -0.05,
          addressnumber = Seq(Seq("9B", "10C", "7")),
          addressprops = Map("override:postcode" ->
            Map(0 -> "20002", 1 -> "20003")))))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(q: String): Seq[(Int, Double, String)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, index, queries)
      .select(col("rank"), col("relev"), col("place_name"))
      .as[(Int, Double, String)].collect().toSeq.sortBy(_._1)
  }

  test("address with override replaces the recalled postcode (9B -> 20002)") {
    val res = fw("9B FAKE STREET")
    assert(res.nonEmpty)
    assert(res.head._3 == "9b fake street Parker 20002", s"got $res")
    assert(res.head._2 === 1.0, s"got $res")
  }

  test("address with override replaces the recalled postcode (10C -> 20003)") {
    val res = fw("10C FAKE STREET")
    assert(res.nonEmpty)
    assert(res.head._3 == "10c fake street Parker 20003", s"got $res")
    assert(res.head._2 === 1.0, s"got $res")
  }

  test("address without override keeps the recalled postcode (7 -> 20001)") {
    val res = fw("7 FAKE STREET")
    assert(res.nonEmpty)
    assert(res.head._3 == "7 fake street Parker 20001", s"got $res")
    assert(res.head._2 === 1.0, s"got $res")
  }
}
