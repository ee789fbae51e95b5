package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.TokenSpec
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward

/** Ported intersection acceptance fixtures (reference
  * test/acceptance/geocode-unit.address-intersections.test.js): V3
  * verify-stage cross-street resolution — "+intersection" covers snap to the
  * exact intersection point from carmen:intersections and format as
  * "{cross} {intersection_token} {street}".
  */
class IntersectionAcceptanceSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var index: IndexBuilder.CarmenIndex = _

  private def gcPoints(pts: Seq[(Double, Double)]): String =
    s"""{"type":"GeometryCollection","geometries":[{"type":"MultiPoint","coordinates":[${
      pts.map(p => s"[${p._1},${p._2}]").mkString(",")}]}]}"""

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])
    index = IndexBuilder.build(spark, Seq(
      (LayerConfig("address", idx = 0, zoom = 6, typ = "address",
        geocoderAddress = true,
        geocoderTokens = Seq("street" -> TokenSpec("st"),
          "northwest" -> TokenSpec("nw"), "road" -> TokenSpec("rd")),
        intersectionToken = "and"),
        docs(
          GeoDoc(1, "9th Street Northwest", 0,
            gcPoints(Seq((0.0, 0.0), (0.0, 0.001))), 0.0, 0.0,
            addressnumber = Seq(Seq("500", "200"))),
          GeoDoc(2, "Highway Number 6,Huckleberry Finn Road,9th Street Northwest,US HWY 1", 0,
            gcPoints(Seq((0.0, 0.002), (0.0, 0.002), (0.0, 0.001))), 0.0, 0.0,
            intersections = Seq(Seq("F Street Northwest", "Highway Number 4",
              "Highway Number 2"))),
          GeoDoc(3, "F Street Northwest", 1,
            gcPoints(Seq((0.0, 0.001))), 0.0, 0.001,
            addressnumber = Seq(Seq("500"))),
          GeoDoc(4, "F Street Northwest,Highway Number 4", 0,
            gcPoints(Seq((0.0, 0.002), (0.0, 0.001), (0.0, 0.003), (0.0, 0.004))),
            0.0, 0.0,
            intersections = Seq(Seq("9th Street Northwest",
              "Frosted Flakes Avenue", "Abercrombie and Fitch Avenue",
              "Huckleberry Finn Road")))))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(q: String): Seq[(Int, Double, String, Double, Double)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, index, queries)
      .select(col("rank"), col("relev"), col("place_name"),
        col("center_lon"), col("center_lat"))
      .as[(Int, Double, String, Double, Double)].collect().toSeq.sortBy(_._1)
  }

  test("street query returns the street, not an intersection point") {
    val res = fw("9th street northwest")
    assert(res.nonEmpty)
    assert(res.head._3 == "9th Street Northwest", s"got $res")
    assert(res.head._4 === 0.0 && res.head._5 === 0.0, s"got $res")
  }

  test("F street northwest returns the street feature") {
    val res = fw("F street northwest")
    assert(res.nonEmpty)
    assert(res.head._3 == "F Street Northwest", s"got $res")
  }

  test("house number on the street still resolves") {
    val res = fw("500 9th street northwest")
    assert(res.nonEmpty)
    assert(res.head._3.startsWith("500 9th Street Northwest"), s"got $res")
    assert(res.head._4 === 0.0 && res.head._5 === 0.0, s"got $res")
  }

  test("intersection query snaps to the exact cross-street point") {
    val res = fw("F Street Northwest and 9th Street Northwest")
    assert(res.nonEmpty)
    assert(res.head._3 == "F Street Northwest and 9th Street Northwest", s"got $res")
    assert(res.head._4 === 0.0 && res.head._5 === 0.002,
      s"intersection point [0, 0.002]: $res")
  }

  test("reversed intersection query matches the other feature's entry") {
    val res = fw("9th Street Northwest and F Street Northwest")
    assert(res.nonEmpty)
    assert(res.head._3.contains("and"), s"got $res")
    assert(res.head._5 === 0.002, s"intersection point [0, 0.002]: $res")
  }
}
