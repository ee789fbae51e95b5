package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward
import TestGeom._

/** Ported Japanese address-order fixtures (reference
  * test/acceptance/geocode-unit.jp-order.test.js): a
  * geocoder_address_order=descending layer keeps full relevance for
  * CJK descending queries and penalizes ascending ones by the direction
  * bonus (0.99) / backy chain (0.865661).
  */
class JpOrderSpec extends AnyFunSuite with BeforeAndAfterAll {
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

    val t32 = tilePoly(6, (32, 32))
    index = IndexBuilder.build(spark, Seq(
      (LayerConfig("country", idx = 0, zoom = 6, typ = "country"),
        docs(GeoDoc(1, "Japan", 0, t32, 0, 0))),
      (LayerConfig("region", idx = 1, zoom = 6, typ = "region"),
        docs(GeoDoc(2, "和歌山県", 0, t32, 0, 0))),
      (LayerConfig("place", idx = 2, zoom = 6, typ = "place"),
        docs(GeoDoc(3, "岩出市", 0, t32, 0, 0))),
      (LayerConfig("address", idx = 3, zoom = 6, typ = "address",
        geocoderAddress = true, geocoderAddressOrder = "descending",
        geocoderFormat = "{{country.name}}, {{region.name}}{{place.name}}{{address.name}}{{address.number}}"),
        docs(GeoDoc(4, "中黒", 0, mpt((0, 0)), 0, 0,
          addressnumber = Seq(Seq("632")))))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(q: String): Seq[(String, Double)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, index, queries, Forward.Options(limitVerify = 1))
      .select(col("place_name"), col("relev"))
      .as[(String, Double)].collect().toSeq
  }

  test("descending CJK query keeps full relevance") {
    val res = fw("岩出市中黒632")
    assert(res.length === 1, s"got $res")
    assert(res.head._1.contains("632"), s"got $res")
    assert(res.head._2 === 1.0, s"got $res")
  }

  test("ascending query on a descending layer drops to 0.99") {
    val res = fw("632 中黒 岩出市")
    assert(res.head._1.contains("632"), s"got $res")
    assert(res.head._2 === 0.99, s"got $res")
  }

  test("mixed-up order drops to 0.865661") {
    val res = fw("632 中黒 Japan 岩出市")
    assert(res.head._1.contains("632"), s"got $res")
    assert(math.abs(res.head._2 - 0.865661) < 1e-6, s"got $res")
  }
}
