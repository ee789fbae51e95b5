package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward
import TestGeom._

/** Ported score-ordering acceptance fixtures:
  *
  *  - reference test/acceptance/geocode-unit.scoresort.test.js — raw
  *    cross-index scores order equally-relevant results (a high-scored
  *    feature in a low-max-score index beats low-scored features in a
  *    high-max-score index);
  *  - geocode-unit.scorefactor.test.js — grid scores are decoded with the
  *    index scorefactor so cross-index comparisons happen in real-score
  *    space, pre-verify (limit_verify 1).
  */
class ScoreSortSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var sort: IndexBuilder.CarmenIndex = _
  private var factor: IndexBuilder.CarmenIndex = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])

    val t32 = tilePoly(6, (32, 32))
    sort = IndexBuilder.build(spark, Seq(
      (LayerConfig("region", idx = 0, zoom = 6, typ = "region"),
        docs((GeoDoc(1, "bigtown", 160000, t32, 0, 0) +:
          (2 until 25).map(i => GeoDoc(i, s"smallville$i", 1, t32, 0, 0))) ++
          (25 until 50).map(i => GeoDoc(i, s"smallville$i", 3000, t32, 0, 0)): _*)),
      (LayerConfig("place", idx = 1, zoom = 6, typ = "place"),
        docs(GeoDoc(1, "smallville1", 10000, t32, 0, 0))),
      (LayerConfig("lamplace", idx = 2, zoom = 6, typ = "lamplace"),
        docs(GeoDoc(1, "smallville1", 36500, t32, 0, 0) +:
          (2 until 25).map(i => GeoDoc(i, s"smallville$i", 6000, t32, 0, 0)): _*)),
      (LayerConfig("namplace", idx = 3, zoom = 6, typ = "namplace"),
        docs(GeoDoc(1, "smallville1", 16000, t32, 0, 0))),
      (LayerConfig("locality", idx = 4, zoom = 6, typ = "locality"),
        docs(GeoDoc(1, "smallville1", 1000, t32, 0, 0)))))

    factor = IndexBuilder.build(spark, Seq(
      (LayerConfig("country", idx = 0, zoom = 6, typ = "country"),
        docs(
          GeoDoc(1, "ignoreme", 1e9, t32, 0, 0),
          GeoDoc(2, "testplace", 1e6, tilePoly(6, (33, 32)), 360.0 / 64 + 0.001, 0))),
      (LayerConfig("place", idx = 1, zoom = 6, typ = "place"),
        docs((1 until 41).map(i =>
          GeoDoc(i, "testplace", 10, t32, 0, 0)): _*))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(idx: IndexBuilder.CarmenIndex, q: String,
                 opts: Forward.Options = Forward.Options()): Seq[(String, String, Long)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, idx, queries, opts)
      .select(col("place_name"), col("place_type"), col("feature_id"))
      .as[(String, String, Long)].collect().toSeq
  }

  test("scoresort: high raw score beats low score despite scorefactor skew") {
    val res = fw(sort, "smallville")
    assert(res.length >= 2, s"got $res")
    assert((res(0)._2, res(0)._3) === (("lamplace", 1L)), s"got $res")
    assert((res(1)._2, res(1)._3) === (("namplace", 1L)), s"got $res")
  }

  test("scorefactor: cross-index decode happens in real-score space") {
    val res = fw(factor, "testplace", Forward.Options(limitVerify = 1))
    assert(res.head._1 === "testplace", s"got $res")
    assert((res.head._2, res.head._3) === (("country", 2L)), s"got $res")
  }
}
