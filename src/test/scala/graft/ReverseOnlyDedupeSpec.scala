package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward

/** Ported carmen:reverse_only + score-dedupe acceptance fixtures
  * (reference test/acceptance/geocode-unit.reverse-only.test.js and
  * geocode-unit.score-dedupe.test.js): reverse_only features never lead a
  * forward result but still appear in context; ghost features with
  * duplicate text dedupe against the scored twin unless only the ghost
  * spatially aligns.
  */
class ReverseOnlyDedupeSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var revOnly: IndexBuilder.CarmenIndex = _
  private var dedupe: IndexBuilder.CarmenIndex = _

  private def pt(lon: Double, lat: Double): String =
    s"""{"type":"Point","coordinates":[$lon,$lat]}"""
  private def poly(w: Double, s: Double, e: Double, n: Double): String =
    s"""{"type":"Polygon","coordinates":[[[$w,$s],[$e,$s],[$e,$n],[$w,$n],[$w,$s]]]}"""

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])
    revOnly = IndexBuilder.build(spark, Seq(
      (LayerConfig("country", idx = 0, zoom = 6, typ = "country"),
        docs(GeoDoc(1, "america", 0, pt(0, 0), 0, 0))),
      (LayerConfig("place", idx = 1, zoom = 6, typ = "place"),
        docs(GeoDoc(3, "some place", 0, pt(0, 0), 0, 0, reverseOnly = true))),
      (LayerConfig("address", idx = 2, zoom = 6, typ = "address",
        geocoderAddress = true),
        docs(GeoDoc(1, "fake street", 0,
          """{"type":"MultiPoint","coordinates":[[0,0],[0,0],[0,0]]}""",
          0, 0)))))
    dedupe = IndexBuilder.build(spark, Seq(
      (LayerConfig("region", idx = 0, zoom = 6, typ = "region"),
        docs(GeoDoc(10, "region", 1, poly(-1, -1, 1, 1), 0, 0))),
      (LayerConfig("place", idx = 1, zoom = 6, typ = "place"),
        docs(
          GeoDoc(1, "fake place 1", -1, pt(0, 0), 0, 0),
          GeoDoc(2, "fake place 1", 1, pt(0, 1.01), 0, 1.01),
          GeoDoc(3, "fake place", 1, pt(0, 0), 0, 0)))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(idx: IndexBuilder.CarmenIndex, q: String): Seq[(String, Long, Double)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, idx, queries)
      .orderBy(col("rank"))
      .select(col("place_name"), col("feature_id"), col("relev"))
      .as[(String, Long, Double)].collect().toSeq
  }

  test("reverse_only feature never leads a forward result") {
    assert(fw(revOnly, "some place").isEmpty)
  }

  test("reverse_only lead suppressed; same-text context query returns parent") {
    val res = fw(revOnly, "some place, america")
    assert(res.nonEmpty)
    assert(res.head._1 === "america", s"got $res")
    assert(res.head._2 === 1L)
  }

  test("reverse_only feature still appears in forward context") {
    val res = fw(revOnly, "fake street, some place")
    assert(res.nonEmpty)
    assert(res.head._1 === "fake street, some place, america", s"got $res")
    assert(res.head._2 === 1L)
  }

  test("ghost with duplicate text dedupes against the scored twin") {
    val res = fw(dedupe, "fake place 1")
    assert(res.nonEmpty, s"got $res")
    assert(res.head._2 === 2L, s"the scored twin wins: $res")
    assert(!res.exists(r => r._2 === 1L && r._1 == "fake place 1"),
      s"ghost deduped away: $res")
    assert(res.length === 2, s"got $res")
  }

  test("ghost survives when only it spatially aligns with the stack") {
    val res = fw(dedupe, "fake place 1 region")
    assert(res.nonEmpty)
    assert(res.head._2 === 1L, s"ghost wins by spatial alignment: $res")
    assert(res.head._3 === 1.0, s"full relevance: $res")
  }
}
