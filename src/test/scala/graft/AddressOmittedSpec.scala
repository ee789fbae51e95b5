package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward
import TestGeom._

/** Ported omitted-interpolation fixtures (reference
  * test/acceptance/geocode-unit.address-omitted.test.js): a house number
  * interpolates on a TIGER range (including numbers falling in the gap
  * BETWEEN MultiLineString segments -> omitted geometry), and omitted
  * results sort below non-omitted ones except under a proximity point
  * inside the radius.
  */
class AddressOmittedSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var single: IndexBuilder.CarmenIndex = _
  private var gap: IndexBuilder.CarmenIndex = _
  private var two: IndexBuilder.CarmenIndex = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])

    single = IndexBuilder.build(spark, Seq(
      (LayerConfig("address", idx = 0, zoom = 6, typ = "address",
        geocoderAddress = true),
        docs(GeoDoc(1, "fake street", 0,
          """{"type":"LineString","coordinates":[[0,0],[0,80]]}""", 0, 0,
          rangetype = "tiger",
          lfromhn = Seq(Seq("0")), ltohn = Seq(Seq("100")))))))

    gap = IndexBuilder.build(spark, Seq(
      (LayerConfig("address", idx = 0, zoom = 6, typ = "address",
        geocoderAddress = true),
        docs(GeoDoc(1, "fake street", 0,
          """{"type":"MultiLineString","coordinates":[[[0,0],[0,10]],[[0,11],[0,20]]]}""",
          0, 0, rangetype = "tiger",
          lfromhn = Seq(Seq("0"), Seq("104")), ltohn = Seq(Seq("100"), Seq("200")))))))

    two = IndexBuilder.build(spark, Seq(
      (LayerConfig("address", idx = 0, zoom = 14, typ = "address",
        geocoderAddress = true),
        docs(
          GeoDoc(1, "fake street", 0,
            """{"type":"MultiLineString","coordinates":[[[0,0],[0,0.5]],[[0,0.6],[0,0.8]]]}""",
            0, 0, rangetype = "tiger",
            lfromhn = Seq(Seq("0"), Seq("104")), ltohn = Seq(Seq("100"), Seq("200"))),
          GeoDoc(2, "far street", 0,
            """{"type":"LineString","coordinates":[[0,0.5],[0,1]]}""", 0, 0,
            rangetype = "tiger",
            lfromhn = Seq(Seq("0")), ltohn = Seq(Seq("200")))))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(idx: IndexBuilder.CarmenIndex, q: String,
                 proximity: Option[(Double, Double)] = None,
                 limitVerify: Int = 10): Seq[(String, Long, Double)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, idx, queries,
      Forward.Options(limitVerify = limitVerify, proximity = proximity))
      .select(col("place_name"), col("feature_id"), col("relev"))
      .as[(String, Long, Double)].collect().toSeq
  }

  test("9 fake street interpolates on a single range") {
    val res = fw(single, "9 fake street", limitVerify = 1)
    assert(res.head._1 === "9 fake street", s"got $res")
    assert(res.head._3 === 1.0, s"got $res")
  }

  test("102 in the inter-segment gap still resolves") {
    val res = fw(gap, "102 fake street", limitVerify = 1)
    assert(res.head._1 === "102 fake street", s"got $res")
    assert(res.head._3 === 1.0, s"got $res")
  }

  test("102 f: non-omitted feature first without proximity") {
    val res = fw(two, "102 f")
    assert(res.length === 2, s"got $res")
    assert(res(0)._2 === 2L, s"got $res")
    assert(res(1)._2 === 1L, s"got $res")
  }

  test("102 f: close proximity point lifts the omitted feature") {
    val res = fw(two, "102 f", proximity = Some((0.0, 0.5)))
    assert(res.length === 2, s"got $res")
    assert(res(0)._2 === 1L, s"got $res")
    assert(res(1)._2 === 2L, s"got $res")
  }

  test("102 f: out-of-radius proximity keeps the non-omitted order") {
    val res = fw(two, "102 f", proximity = Some((0.0, -3.0)))
    assert(res.length === 2, s"got $res")
    assert(res(0)._2 === 2L, s"got $res")
    assert(res(1)._2 === 1L, s"got $res")
  }
}
