package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward
import TestGeom._

/** Ported fixtures:
  *
  *  - reference test/acceptance/geocode-unit.dataterm.test.js — the house
  *    number disambiguates between 41 same-named address clusters
  *    (limit_verify 1: the winning candidate must verify against its
  *    cluster's numbers, not just the phrase);
  *  - geocode-unit.named.test.js — two sources sharing a geocoder_name are
  *    one logical layer: same-name siblings never appear in each other's
  *    context.
  */
class DatatermNamedSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var dataterm: IndexBuilder.CarmenIndex = _
  private var named: IndexBuilder.CarmenIndex = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])

    dataterm = IndexBuilder.build(spark, Seq(
      (LayerConfig("address", idx = 0, zoom = 6, typ = "address",
        geocoderAddress = true, geocoderName = "address"),
        docs((1 until 41).map(i =>
          GeoDoc(i, "fake street", 0, mpt((0, 0)), 0, 0,
            addressnumber = Seq(Seq("600")))) :+
          GeoDoc(101, "fake street", 0, mpt((0, 0)), 0, 0,
            addressnumber = Seq(Seq("1500"))): _*))))

    named = IndexBuilder.build(spark, Seq(
      (LayerConfig("place_a", idx = 0, zoom = 6, typ = "place",
        geocoderName = "place"),
        docs(GeoDoc(1, "sadtown", 0, tilePoly(6, (32, 32)), 0, 0))),
      (LayerConfig("place_b", idx = 1, zoom = 6, typ = "place",
        geocoderName = "place"),
        docs(GeoDoc(2, "funtown", 0, tilePoly(6, (32, 32)), 0, 0)))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(idx: IndexBuilder.CarmenIndex, q: String,
                 limitVerify: Int = 10): Seq[(String, Long, Double)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, idx, queries,
      Forward.Options(limitVerify = limitVerify))
      .select(col("place_name"), col("feature_id"), col("relev"))
      .as[(String, Long, Double)].collect().toSeq
  }

  test("dataterm: house number picks the right cluster at limit_verify 1") {
    val res = fw(dataterm, "1500 fake street", limitVerify = 1)
    assert(res.head._1 === "1500 fake street", s"got $res")
    assert(res.head._2 === 101L, s"got $res")
    assert(res.head._3 === 1.0, s"got $res")
  }

  test("named: sadtown resolves without its geocoder_name sibling in context") {
    val res = fw(named, "sadtown", limitVerify = 1)
    assert(res.head._1 === "sadtown" && res.head._2 === 1L, s"got $res")
  }

  test("named: funtown resolves without its geocoder_name sibling in context") {
    val res = fw(named, "funtown", limitVerify = 1)
    assert(res.head._1 === "funtown" && res.head._2 === 2L, s"got $res")
  }
}
