package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.{Forward, Reverse}
import TestGeom._

/** Ported fixtures:
  *
  *  - reference test/acceptance/geocode-unit.context-overlap.test.js —
  *    context claims one feature per geocoder_name group, preferring the
  *    deeper source (funtown in place_b beats sadtown in place_a);
  *  - geocode-unit.index-limit.test.js — 128 configured sources (127
  *    sharing geocoder_name "country") still forward- and
  *    reverse-geocode correctly.
  */
class ContextOverlapSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var overlap: IndexBuilder.CarmenIndex = _
  private var many: IndexBuilder.CarmenIndex = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])

    val t32 = tilePoly(6, (32, 32))
    overlap = IndexBuilder.build(spark, Seq(
      (LayerConfig("place_a", idx = 0, zoom = 6, typ = "place",
        geocoderName = "place"),
        docs(GeoDoc(1, "sadtown", 0, t32, 0, 0))),
      (LayerConfig("place_b", idx = 1, zoom = 6, typ = "place",
        geocoderName = "place"),
        docs(GeoDoc(2, "funtown", 0, t32, 0, 0))),
      (LayerConfig("street_a", idx = 2, zoom = 6, typ = "street",
        geocoderName = "street"),
        docs(GeoDoc(2, "wall street", 0, t32, 0, 0))),
      (LayerConfig("street_b", idx = 3, zoom = 6, typ = "street",
        geocoderName = "street"),
        docs(GeoDoc(1, "main street", 0, t32, 0, 0)))))

    many = IndexBuilder.build(spark,
      (0 until 127).map { i =>
        (LayerConfig(s"country$i", idx = i, zoom = 6, typ = "country",
          geocoderName = "country"),
          docs(GeoDoc(1, "USA", 0, t32, 0, 0)))
      } :+
        ((LayerConfig("place", idx = 127, zoom = 6, typ = "place",
          geocoderName = "place"),
          docs(GeoDoc(1, "Chicago", 0, t32, 0, 0)))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("context-overlap: deeper geocoder_name sibling claims the context slot") {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, "main street")).toDF("query_id", "query")
    val res = Forward.forward(spark, overlap, queries,
      Forward.Options(limitVerify = 1))
      .select(col("place_name"), col("place_type"), col("feature_id"))
      .as[(String, String, Long)].collect().toSeq
    assert(res.head._1 === "main street, funtown", s"got $res")
    assert(res.head._2 === "street" && res.head._3 === 1L, s"got $res")
  }

  test("index-limit: 128 sources forward") {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, "Chicago")).toDF("query_id", "query")
    val res = Forward.forward(spark, many, queries,
      Forward.Options(limitVerify = 1))
      .select(col("place_name"), col("relev"))
      .as[(String, Double)].collect().toSeq
    assert(res.head === (("Chicago, USA", 1.0)), s"got $res")
  }

  test("index-limit: 128 sources reverse") {
    val sp = spark; import sp.implicits._
    val pts = Seq((1L, 0.0, 0.0)).toDF("query_id", "lon", "lat")
    val res = Reverse.reverseWithOptions(spark, many, pts,
      Reverse.ReverseOptions())
      .select(col("place_name")).as[String].collect().toSeq
    assert(res.head === "Chicago, USA", s"got $res")
  }
}
