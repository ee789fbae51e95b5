package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.{Forward, Reverse}

/** Context assembly across a five-layer stack + the name-conflict guard,
  * ported from test/acceptance/geocode-unit.index-context.test.js (the
  * full context rides the result in layer order; an id query touches only
  * its own index) and geocode-unit.name-conflict.test.js (a poi source
  * named geocoder_name='address' full of 'Canada Post Na' features never
  * hijacks 'Waterford Valley Canada').
  */
class IndexContextSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var ctxIndex: IndexBuilder.CarmenIndex = _
  private var conflictIndex: IndexBuilder.CarmenIndex = _

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
    ctxIndex = IndexBuilder.build(spark, Seq(
      (LayerConfig("country", idx = 0, zoom = 6, typ = "country"),
        docs(GeoDoc(1, "united states", 0, pt(0, 0), 0, 0))),
      (LayerConfig("region", idx = 1, zoom = 6, typ = "region"),
        docs(GeoDoc(1, "maine", 0, pt(0, 0), 0, 0))),
      (LayerConfig("postcode", idx = 2, zoom = 6, typ = "postcode"),
        docs(GeoDoc(1, "12345", 0, pt(0, 0), 0, 0))),
      (LayerConfig("place", idx = 3, zoom = 6, typ = "place"),
        docs(GeoDoc(1, "springfield", 0, pt(0, 0), 0, 0))),
      (LayerConfig("address", idx = 4, zoom = 6, typ = "address",
        geocoderAddress = true),
        docs(GeoDoc(1, "fake street", 0,
          """{"type":"GeometryCollection","geometries":[{"type":"MultiPoint","coordinates":[[0,0],[0,0],[0,0]]}]}""",
          0, 0, addressnumber = Seq(Seq("9", "10", "7")))))))

    conflictIndex = IndexBuilder.build(spark, Seq(
      (LayerConfig("country", idx = 0, zoom = 6, typ = "country"),
        docs(GeoDoc(1, "Canada", 0, pt(0, 0), 0, 0))),
      (LayerConfig("region", idx = 1, zoom = 6, typ = "region"),
        docs(GeoDoc(1, "Newfoundland and Labrador", 0, pt(0, 0), 0, 0))),
      (LayerConfig("postcode", idx = 2, zoom = 6, typ = "postcode"),
        docs(GeoDoc(1, "A1N 4Y1", 0, pt(0, 0), 0, 0))),
      (LayerConfig("place", idx = 3, zoom = 6, typ = "place"),
        docs(GeoDoc(1, "Mount Pearl", 0, pt(0, 0), 0, 0))),
      (LayerConfig("neighborhood", idx = 4, zoom = 6, typ = "neighborhood"),
        docs(GeoDoc(1, "Waterford Valley", 0, pt(0, 0), 0, 0))),
      (LayerConfig("poi", idx = 5, zoom = 6, typ = "poi",
        geocoderName = "address"),
        docs((1 until 20).map(i =>
          GeoDoc(i, s"Canada Post ${i}a", 0, pt(0, 0), 0, 0)): _*))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("address search assembles the full five-index context in order") {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, "9 fake street")).toDF("query_id", "query")
    val res = Forward.forward(spark, ctxIndex, queries,
      Forward.Options(limitVerify = 1))
      .select(col("place_name"), col("place_type")).as[(String, String)]
      .collect()
    assert(res.length === 1, s"got ${res.toSeq}")
    assert(res.head._1 ===
      "9 fake street, springfield, 12345, maine, united states")
    assert(res.head._2 === "address")
  }

  test("id query touches only its own index") {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, "address.1")).toDF("query_id", "query")
    val res = Reverse.idGeocode(spark, ctxIndex, queries)
      .select(col("layer"), col("feature_id"), col("place_name"))
      .as[(String, Long, String)].collect()
    assert(res.toSeq === Seq(("address", 1L, "fake street")))
  }

  test("name-conflict: 'Waterford Valley Canada' resolves to the neighborhood") {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, "Waterford Valley Canada")).toDF("query_id", "query")
    val res = Forward.forward(spark, conflictIndex, queries)
      .select(col("place_type"), col("feature_id")).as[(String, Long)]
      .collect()
    assert(res.nonEmpty)
    assert(res.head === (("neighborhood", 1L)), s"got ${res.toSeq}")
  }
}
