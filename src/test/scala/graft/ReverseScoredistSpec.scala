package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Reverse

/** Ported reverse-scoredist acceptance fixtures (reference
  * test/acceptance/geocode-unit.reverse-scoredist.test.js): the flat
  * 1000 m vtquery distance threshold, reverseMode validation, score-mode
  * distscore ordering, and the conflict-key block between same-
  * geocoder_name layers.
  */
class ReverseScoredistSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var index: IndexBuilder.CarmenIndex = _

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
    index = IndexBuilder.build(spark, Seq(
      (LayerConfig("address", idx = 0, zoom = 6, typ = "address",
        geocoderName = "address", geocoderAddress = true),
        docs(GeoDoc(1, "e", 1, pt(1.006, 1.006), 1.0071, 1.0071))),
      (LayerConfig("poi", idx = 1, zoom = 6, typ = "poi",
        geocoderName = "address"),
        docs(
          GeoDoc(1, "a", 0, pt(0, 0), 0, 0),
          GeoDoc(2, "b", 0, pt(0.1, -0.1), 0.1, -0.1),
          GeoDoc(3, "c", 10000, pt(1.005, 1.005), 1.005, 1.005),
          GeoDoc(4, "d", 10, pt(1.006, 1.006), 1.006, 1.006)))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def rev(lon: Double, lat: Double,
                  mode: String = "distance"): Seq[(String, Long)] = {
    val sp = spark; import sp.implicits._
    val pts = Seq((1L, lon, lat)).toDF("query_id", "lon", "lat")
    Reverse.reverseWithOptions(spark, index, pts,
      Reverse.ReverseOptions(reverseMode = mode))
      .select(col("place_name"), col("feature_id"))
      .as[(String, Long)].collect().toSeq
  }

  test("invalid reverseMode errors with the reference message") {
    val sp = spark; import sp.implicits._
    val pts = Seq((1L, 0.0, 0.0)).toDF("query_id", "lon", "lat")
    val e = intercept[IllegalArgumentException] {
      Reverse.reverseWithOptions(spark, index, pts,
        Reverse.ReverseOptions(reverseMode = "foo"))
    }
    assert(e.getMessage ===
      "foo is not a valid reverseMode. Must be one of: score, distance")
  }

  test("reverse distance threshold: 0.006 deg off matches, 0.007 does not") {
    val close = rev(0.106, -0.106)
    assert(close.length === 1, s"got $close")
    assert(close.head._1 === "b")
    assert(rev(0.107, -0.107).isEmpty)
  }

  test("score mode returns the higher-scored, more distant feature first") {
    val res = rev(1.007, 1.007, mode = "score")
    assert(res.nonEmpty)
    assert(res.head === (("c", 3L)), s"got $res")
  }
}
