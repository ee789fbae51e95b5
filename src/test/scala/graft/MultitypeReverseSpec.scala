package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Reverse

/** Multitype reverse behavior, ported from
  * test/acceptance/geocode-unit.multitype-reverse.test.js: a
  * region-promoted-to-place feature fills the poi's context under its
  * shifted type, and a types filter makes the multitype feature itself the
  * result under whichever of its types is asked for.
  */
class MultitypeReverseSpec extends AnyFunSuite with BeforeAndAfterAll {
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
    val poly =
      """{"type":"Polygon","coordinates":[[[-40,-40],[-40,40],[40,40],[40,-40],[-40,-40]]]}"""
    index = IndexBuilder.build(spark, Seq(
      (LayerConfig("region", idx = 0, zoom = 6, typ = "region",
        geocoderTypes = Seq("region", "place")),
        docs(GeoDoc(1, "caracas", 0, poly, 0, 0,
          types = Seq("region", "place")))),
      (LayerConfig("poi", idx = 1, zoom = 6, typ = "poi"),
        docs(GeoDoc(1, "cafe", 0,
          """{"type":"Point","coordinates":[0,0]}""", 0, 0)))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def rev(types: Seq[String]): Seq[(String, Long, String)] = {
    val sp = spark; import sp.implicits._
    val pts = Seq((1L, 0.0, 0.0)).toDF("query_id", "lon", "lat")
    Reverse.reverseWithOptions(spark, index, pts,
      Reverse.ReverseOptions(types = types))
      .select(col("place_name"), col("feature_id"), col("typ"))
      .as[(String, Long, String)].collect().toSeq
  }

  test("multitype reverse: full context, no shifts") {
    val res = rev(Nil)
    assert(res.nonEmpty)
    assert(res.head === (("cafe, caracas", 1L, "poi")), s"got $res")
  }

  test("multitype reverse, types=poi: same result") {
    val res = rev(Seq("poi"))
    assert(res.head === (("cafe, caracas", 1L, "poi")), s"got $res")
  }

  test("multitype reverse, types=place: caracas shifts to place") {
    val res = rev(Seq("place"))
    assert(res.head._1 === "caracas", s"got $res")
    assert(res.head._2 === 1L)
    assert(res.head._3 === "place", s"got $res")
  }

  test("multitype reverse, types=region: caracas as region") {
    val res = rev(Seq("region"))
    assert(res.head._1 === "caracas", s"got $res")
    assert(res.head._3 === "region", s"got $res")
  }

  test("multitype reverse, types=place,region: finest type wins") {
    val res = rev(Seq("place", "region"))
    assert(res.head._1 === "caracas", s"got $res")
    assert(res.head._3 === "place", s"got $res")
  }
}
