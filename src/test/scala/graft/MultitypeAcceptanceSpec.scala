package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.{Forward, Reverse}

/** Ported multitype acceptance fixtures (reference
  * test/acceptance/geocode-unit.multitype.test.js and
  * geocode-unit.multitype-leapfrog.test.js): carmen:types features shift
  * between stack types, forward extids use the LAST type, maxtype blocks
  * re-claiming the lead's type (R8).
  */
class MultitypeAcceptanceSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var index: IndexBuilder.CarmenIndex = _     // multitype fixture
  private var leap: IndexBuilder.CarmenIndex = _      // leapfrog fixture

  private def poly(w: Double, s: Double, e: Double, n: Double): String =
    s"""{"type":"Polygon","coordinates":[[[$w,$s],[$e,$s],[$e,$n],[$w,$n],[$w,$s]]]}"""
  private def pt(lon: Double, lat: Double): String =
    s"""{"type":"Point","coordinates":[$lon,$lat]}"""

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])
    val box = poly(-40, -40, 40, 40)
    index = IndexBuilder.build(spark, Seq(
      (LayerConfig("region", idx = 0, zoom = 6, typ = "region",
        geocoderTypes = Seq("region", "place")),
        docs(GeoDoc(1, "caracas", 0, box, 0, 0,
          types = Seq("region", "place")))),
      (LayerConfig("place", idx = 1, zoom = 6, typ = "place"),
        docs(GeoDoc(1, "libertador", 0, box, 0, 0))),
      (LayerConfig("poi", idx = 2, zoom = 6, typ = "poi"),
        docs(GeoDoc(1, "cafe", 0, pt(0, 0), 0, 0)))))
    leap = IndexBuilder.build(spark, Seq(
      (LayerConfig("region", idx = 0, zoom = 6, typ = "region",
        geocoderTypes = Seq("region", "place")),
        docs(GeoDoc(1, "capital", 0, box, 0, 0,
          types = Seq("region", "place")))),
      (LayerConfig("district", idx = 1, zoom = 6, typ = "district"),
        docs(GeoDoc(1, "district 1", 0, box, 0, 0),
          GeoDoc(2, "district 2", 0, box, 0, 0))),
      (LayerConfig("place", idx = 2, zoom = 6, typ = "place"),
        docs(GeoDoc(2, "smallplace", 0, box, 0, 0)))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def rev(idx: IndexBuilder.CarmenIndex, types: Seq[String]): Seq[(String, String, Long)] = {
    val sp = spark; import sp.implicits._
    val pts = Seq((1L, 0.0, 0.0)).toDF("query_id", "lon", "lat")
    Reverse.reverseWithOptions(spark, idx, pts,
      Reverse.ReverseOptions(types = types))
      .select(col("place_name"), col("typ"), col("feature_id"))
      .as[(String, String, Long)].collect().toSeq
  }

  private def fw(idx: IndexBuilder.CarmenIndex, q: String,
                 types: Seq[String] = Nil): Seq[(String, String, Long)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, idx, queries, Forward.Options(types = types))
      .select(col("place_name"), col("place_type"), col("feature_id"))
      .as[(String, String, Long)].collect().toSeq
  }

  test("multitype reverse: full context, no shifts") {
    val res = rev(index, Nil)
    assert(res.nonEmpty)
    assert(res.head === (("cafe, libertador, caracas", "poi", 1L)), s"got $res")
  }

  test("multitype reverse, types=poi") {
    val res = rev(index, Seq("poi"))
    assert(res.head === (("cafe, libertador, caracas", "poi", 1L)), s"got $res")
  }

  test("multitype reverse, types=place: no shift") {
    val res = rev(index, Seq("place"))
    assert(res.head === (("libertador, caracas", "place", 1L)), s"got $res")
  }

  test("multitype reverse, types=region: no shift") {
    val res = rev(index, Seq("region"))
    assert(res.head === (("caracas", "region", 1L)), s"got $res")
  }

  test("multitype reverse, types=place,region") {
    val res = rev(index, Seq("place", "region"))
    assert(res.head === (("libertador, caracas", "place", 1L)), s"got $res")
  }

  test("multitype forward, q=cafe: full context") {
    val res = fw(index, "cafe")
    assert(res.nonEmpty)
    assert(res.head === (("cafe, libertador, caracas", "poi", 1L)), s"got $res")
  }

  test("multitype forward, q=libertador") {
    val res = fw(index, "libertador")
    assert(res.head === (("libertador, caracas", "place", 1L)), s"got $res")
  }

  test("multitype forward, q=caracas: claims place with shift") {
    val res = fw(index, "caracas")
    assert(res.head === (("caracas", "place", 1L)), s"got $res")
  }

  test("multitype forward, q=caracas, types=place") {
    val res = fw(index, "caracas", types = Seq("place"))
    assert(res.head === (("caracas", "place", 1L)), s"got $res")
  }

  test("multitype leapfrog reverse: shifted over district") {
    val res = rev(leap, Nil)
    assert(res.head === (("smallplace, district 1, capital", "place", 2L)),
      s"got $res")
  }

  test("multitype leapfrog forward, q=capital: shifted forward") {
    val res = fw(leap, "capital")
    assert(res.head === (("capital", "place", 1L)), s"got $res")
  }
}
