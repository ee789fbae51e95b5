package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward

/** Ported fuzzy-address acceptance fixtures (reference
  * test/acceptance/geocode-unit.fuzzy.test.js, complex fixture): the fuzzy
  * edit budget extends to address-permutation windows (P6,
  * phrasematch.js:183-296), composes with the whitespace corrector's spent
  * budget, and typo count orders relevance.
  */
class FuzzyAddressAcceptanceSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var index: IndexBuilder.CarmenIndex = _

  private def pt(lon: Double, lat: Double): String =
    s"""{"type":"Point","coordinates":[$lon,$lat]}"""
  private def gcPoints(pts: (Double, Double)*): String =
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
      (LayerConfig("region", idx = 0, zoom = 6, typ = "region"),
        docs(GeoDoc(110, "DC", 0, pt(0, 0), 0, 0))),
      (LayerConfig("place", idx = 1, zoom = 6, typ = "place"),
        docs(GeoDoc(105, "Washington", 0, pt(0, 0), 0, 0))),
      (LayerConfig("address", idx = 2, zoom = 6, typ = "address",
        geocoderAddress = true),
        docs(
          GeoDoc(100, "Main St", 0, gcPoints((0, 0)), 0, 0,
            addressnumber = Seq(Seq("100"))),
          GeoDoc(101, "Maine St", 0, gcPoints((0, 0)), 0, 0,
            addressnumber = Seq(Seq("100")))))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(q: String, fuzzy: Boolean,
                 types: Seq[String] = Nil): Seq[(String, Long, Double)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, index, queries,
      Forward.Options(fuzzy = fuzzy, types = types, limitVerify = 2))
      .select(col("place_name"), col("feature_id"), col("relev"))
      .as[(String, Long, Double)].collect().toSeq
  }

  test("100 main st washington dc - without fuzzy: exact only") {
    val res = fw("100 Main St washington dc", fuzzy = false,
      types = Seq("address"))
    assert(res.length === 1, s"got $res")
    assert(res.head._1 === "100 Main St, Washington, DC", s"got $res")
    assert(res.head._2 === 100L)
    assert(res.head._3 === 1.0, s"got $res")
  }

  test("100 Main St washington dc - with fuzzy: Maine St second, relev < 1") {
    val res = fw("100 Main St washington dc", fuzzy = true)
    assert(res.length >= 2, s"got $res")
    assert(res(0)._1 === "100 Main St, Washington, DC", s"got $res")
    assert(res(0)._2 === 100L)
    assert(res(0)._3 === 1.0, s"got $res")
    assert(res(1)._1 === "100 Maine St, Washington, DC", s"got $res")
    assert(res(1)._2 === 101L)
    assert(res(1)._3 < 1.0, s"got $res")
  }

  test("100 Main St warshington dc - with fuzzy: more typos = worse relevance") {
    val res = fw("100 Main St warshington dc", fuzzy = true)
    assert(res.length >= 2, s"got $res")
    assert(res(0)._1 === "100 Main St, Washington, DC", s"got $res")
    assert(res(0)._3 < 1.0, s"got $res")
    assert(res(1)._1 === "100 Maine St, Washington, DC", s"got $res")
    assert(res(1)._3 < res(0)._3, s"got $res")
  }

  test("100Main St washington dc - whitespace split needs fuzzy on") {
    val off = fw("100Main St washington dc", fuzzy = false,
      types = Seq("address"))
    assert(off.isEmpty, s"got $off")
    val on = fw("100Main St washington dc", fuzzy = true,
      types = Seq("address"))
    assert(on.nonEmpty, s"got $on")
    assert(on.head._1 === "100 Main St, Washington, DC", s"got $on")
    assert(on.head._3 < 1.0, s"got $on")
  }

  test("100Man St washington dc - whitespace + spelling exceeds the budget") {
    val res = fw("100Man St washington dc", fuzzy = true,
      types = Seq("address"))
    assert(res.isEmpty, s"got $res")
  }

  test("100 mainst washington dc - non-numeric whitespace error returns nothing") {
    val res = fw("100 mainst washington dc", fuzzy = true,
      types = Seq("address"))
    assert(res.isEmpty, s"got $res")
  }

  test("9b fake streat - misspelled street with house number resolves") {
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])
    val idx2 = IndexBuilder.build(spark, Seq(
      (LayerConfig("address", idx = 0, zoom = 6, typ = "address",
        geocoderAddress = true),
        docs(GeoDoc(1, "fake street", 0,
          gcPoints((0.001, 0.001), (0.002, 0.002)), 0.001, 0.001,
          addressnumber = Seq(Seq("9b", "10c")))))))
    import sp.implicits._
    val queries = Seq((1L, "9b fake streat")).toDF("query_id", "query")
    val res = Forward.forward(spark, idx2, queries,
      Forward.Options(fuzzy = true))
      .select(col("place_name"), col("relev"))
      .as[(String, Double)].collect().toSeq
    assert(res.nonEmpty, "misspelled street + number must resolve")
    assert(res.head._1 === "9b fake street", s"got $res")
    assert(res.head._2 < 1.0 && res.head._2 >= 0.75, s"got $res")
  }
}
