package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.{Forward, Reverse}

/** Ported worldview acceptance fixtures (reference
  * test/acceptance/geocode-unit.worldviews.test.js): worldview-specific
  * layer variants share one geocoder_name; queries only see their
  * worldview's layers plus the shared ones; the default worldview is the
  * first configured one.
  */
class WorldviewAcceptanceSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var index: IndexBuilder.CarmenIndex = _

  private def poly(pts: (Double, Double)*): String =
    s"""{"type":"Polygon","coordinates":[[${pts.map(p => s"[${p._1},${p._2}]").mkString(",")}]]}"""

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])
    // us worldview: China excludes the HK box; HK is a country-level
    // multi-type feature. cn worldview: China includes the HK box; HK is a
    // region inside China.
    val chinaUs = poly((70, 20), (115, 20), (115, 30), (125, 30), (125, 50),
      (70, 50), (70, 20))
    val chinaCn = poly((70, 20), (125, 20), (125, 50), (70, 50), (70, 20))
    val hkBox = poly((115, 20), (125, 20), (125, 30), (115, 30), (115, 20))
    index = IndexBuilder.build(spark, Seq(
      (LayerConfig("country_wv_us", idx = 0, zoom = 6, typ = "country",
        geocoderName = "country", worldview = "us",
        stack = Seq("cn", "hk", "jp")),
        docs(
          GeoDoc(1, "China", 25000, chinaUs, 97.5, 35),
          GeoDoc(2, "Hong Kong", 5000, hkBox, 120, 25,
            types = Seq("country", "region", "place")))),
      (LayerConfig("country_wv_cn", idx = 1, zoom = 6, typ = "country",
        geocoderName = "country", worldview = "cn",
        stack = Seq("cn", "jp")),
        docs(GeoDoc(3, "China", 25000, chinaCn, 97.5, 35))),
      (LayerConfig("region_wv_cn", idx = 2, zoom = 6, typ = "region",
        geocoderName = "region", worldview = "cn", stack = Seq("cn")),
        docs(GeoDoc(52, "Hong Kong", 5000, hkBox, 120, 25,
          types = Seq("region", "place"))))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(q: String, worldview: String = ""): Seq[(String, Long)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, index, queries,
      Forward.Options(worldview = worldview))
      .select(col("place_name"), col("feature_id"))
      .as[(String, Long)].collect().toSeq
  }

  private def rev(lon: Double, lat: Double, worldview: String,
                  types: Seq[String]): Seq[(String, Long)] = {
    val sp = spark; import sp.implicits._
    val pts = Seq((1L, lon, lat)).toDF("query_id", "lon", "lat")
    Reverse.reverseWithOptions(spark, index, pts,
      Reverse.ReverseOptions(types = types, worldview = worldview))
      .select(col("place_name"), col("feature_id"))
      .as[(String, Long)].collect().toSeq
  }

  test("china resolves to the us variant by default and with worldview=us") {
    assert(fw("china").map(_._2) === Seq(1L))
    assert(fw("china", "us").map(_._2) === Seq(1L))
  }

  test("china resolves to the cn variant with worldview=cn") {
    assert(fw("china", "cn").map(_._2) === Seq(3L))
  }

  test("hong kong in worldview=us is a top-level feature") {
    val res = fw("hong kong", "us")
    assert(res.nonEmpty)
    assert(res.head === (("Hong Kong", 2L)), s"got $res")
  }

  test("hong kong in worldview=cn is a region inside China") {
    val res = fw("hong kong", "cn")
    assert(res.nonEmpty)
    assert(res.head === (("Hong Kong, China", 52L)), s"got $res")
  }

  test("reverse hong kong centerpoint, types=region: us has no china context") {
    val us = rev(120, 25, "us", Seq("region"))
    assert(us.nonEmpty)
    assert(us.head._1 === "Hong Kong", s"got $us")
    assert(rev(120, 25, "", Seq("region")) === us)
  }

  test("reverse hong kong centerpoint, types=region, worldview=cn") {
    val cn = rev(120, 25, "cn", Seq("region"))
    assert(cn.nonEmpty)
    assert(cn.head === (("Hong Kong, China", 52L)), s"got $cn")
  }

  test("unknown worldview errors with the reference message") {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, "china")).toDF("query_id", "query")
    val e = intercept[IllegalArgumentException] {
      Forward.forward(spark, index, queries, Forward.Options(worldview = "in"))
    }
    assert(e.getMessage.matches("(?i)Worldview must be.*"), e.getMessage)
  }
}
