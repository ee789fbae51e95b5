package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward
import TestGeom._

/** Ported hash/encoding collision fixtures:
  *
  *  - reference test/acceptance/geocode-unit.dict-collision.test.js — CJK
  *    phrases round-trip through the phrase dictionary;
  *  - geocode-unit.fnv1a-collision.test.js — partially-matching unidecoded
  *    address phrases do not collide into false positives;
  *  - geocode-unit.unidecollide.test.js — a unidecoded translation does
  *    not create phantom matches ("aruba" vs アルバータ州), and
  *    mid-phrase prefixes never match ("yz" / "a yz" vs "abc Xyz").
  */
class CollisionSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var dict: IndexBuilder.CarmenIndex = _
  private var fnv: IndexBuilder.CarmenIndex = _
  private var alberta: IndexBuilder.CarmenIndex = _
  private var abcxyz: IndexBuilder.CarmenIndex = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])

    val t32 = tilePoly(6, (32, 32))
    dict = IndexBuilder.build(spark, Seq(
      (LayerConfig("place", idx = 0, zoom = 6, typ = "place"),
        docs(GeoDoc(1, "京都市", 0, t32, 0, 0)))))

    fnv = IndexBuilder.build(spark, Seq(
      (LayerConfig("test", idx = 0, zoom = 6, typ = "test",
        geocoderAddress = true),
        docs(
          GeoDoc(1, "av francisco de aguirre", 0, mpt((0, 0)), 0, 0,
            addressnumber = Seq(Seq("2"))),
          GeoDoc(2, "r ademar da silva neiva", 0, mpt((0, 0)), 0, 0,
            addressnumber = Seq(Seq("2")))))))

    alberta = IndexBuilder.build(spark, Seq(
      (LayerConfig("place_a", idx = 0, zoom = 6, typ = "region",
        geocoderName = "region", languages = Seq("ja")),
        docs(GeoDoc(1, "Alberta", 0, t32, 0, 0,
          langTexts = Map("ja" -> "アルバータ州"))))))

    abcxyz = IndexBuilder.build(spark, Seq(
      (LayerConfig("place_a", idx = 0, zoom = 6, typ = "region",
        geocoderName = "region"),
        docs(GeoDoc(1, "abc Xyz", 0, t32, 0, 0)))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(idx: IndexBuilder.CarmenIndex, q: String): Seq[(String, Long)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, idx, queries, Forward.Options(limitVerify = 2))
      .select(col("place_name"), col("feature_id"))
      .as[(String, Long)].collect().toSeq
  }

  test("dict-collision: CJK phrase matches itself") {
    val res = fw(dict, "京都市")
    assert(res.length === 1, s"got $res")
  }

  test("fnv1a-collision: partial unidecoded terms do not match") {
    val res = fw(fnv, "av francisco de aguirre 2 la serena")
    assert(res.length === 1, s"got $res")
    assert(res.head._2 === 1L, s"got $res")
  }

  test("unidecollide: aruba does not match the unidecoded translation") {
    assert(fw(alberta, "aruba").isEmpty)
  }

  test("unidecollide: JP query matches") {
    val res = fw(alberta, "アルバータ州")
    assert(res.head === (("Alberta", 1L)), s"got $res")
  }

  test("unidecollide: latin prefix matches") {
    val res = fw(alberta, "Alber")
    assert(res.head === (("Alberta", 1L)), s"got $res")
  }

  test("unidecollide: mid-phrase char prefixes never match") {
    assert(fw(abcxyz, "yz").isEmpty)
    assert(fw(abcxyz, "a yz").isEmpty)
  }
}
