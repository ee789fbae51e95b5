package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward
import TestGeom._

/** Ported number-number fixtures (reference
  * test/acceptance/geocode-unit.address-numnum.test.js): Swedish-style
  * "115 37" queries prefer the two-token postcode over house number 37 on
  * the street named "115", and "115 115" resolves on the numeric street.
  */
class AddressNumnumSpec extends AnyFunSuite with BeforeAndAfterAll {
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
        docs(GeoDoc(2, "Sweden", 0, poly(-1, -1, 1, 1), 0, 0))),
      (LayerConfig("postcode", idx = 1, zoom = 6, typ = "postcode"),
        docs(GeoDoc(3, "115 37", 0, pt(-0.5, -0.5), -0.5, -0.5))),
      (LayerConfig("address", idx = 2, zoom = 6, typ = "address",
        geocoderAddress = true),
        docs(GeoDoc(1, "115", 0,
          """{"type":"LineString","coordinates":[[0,0],[0,0.5]]}""", 0, 0,
          rangetype = "tiger",
          lfromhn = Seq(Seq("0")), ltohn = Seq(Seq("200")))))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(q: String): Seq[(String, String)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, index, queries)
      .select(col("place_name"), col("place_type"))
      .as[(String, String)].collect().toSeq
  }

  test("115 37 Sweden: postcode first, numeric-street address second") {
    val res = fw("115 37 Sweden")
    assert(res.length >= 2, s"got $res")
    assert(res(0) === (("115 37, Sweden", "postcode")), s"got $res")
    assert(res(1) === (("37 115, Sweden", "address")), s"got $res")
  }

  test("115 115 Sweden: resolves on the numeric street") {
    val res = fw("115 115 Sweden")
    assert(res.head === (("115 115, Sweden", "address")), s"got $res")
  }
}
