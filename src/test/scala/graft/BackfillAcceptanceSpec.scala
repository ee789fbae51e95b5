package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward

/** Ported verifymatch backfill fixture (reference
  * test/acceptance/geocode-unit.verifymatch-backfill.js): ten "coffee"
  * POIs each share a z12 tile with a small "place N" polygon WITHOUT
  * being inside it (their real context is "other N"), so each stacks
  * "coffee place" at relev 1 in spatialmatch but verifies at ~0.5. An
  * eleventh "coffee" sits inside a polygon actually NAMED "place" and
  * verifies at 1. The context-phase chunk machine (V14) must backfill
  * past the first limit_verify batch of disappointing candidates to
  * surface it first.
  */
class BackfillAcceptanceSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var index: IndexBuilder.CarmenIndex = _

  private def poly(w: Double, s: Double, e: Double, n: Double): String =
    s"""{"type":"Polygon","coordinates":[[[$w,$s],[$e,$s],[$e,$n],[$w,$n],[$w,$s]]]}"""
  private def pt(lon: Double, lat: Double): String =
    s"""{"type":"Point","coordinates":[$lon,$lat]}"""

  // the reference fixture's layout: z12 tile width, 1/12-tile boxes,
  // POIs offset ~3000m north of each place box (same z12 tile, outside
  // the box, inside an "other" box)
  private val tileWidth12 = 0.087890625
  private val boxSize = 0.00732
  private val poiDy = 0.02696

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])

    val lefts = (0 until 10).map(i => i * (tileWidth12 + boxSize))
    val places = lefts.zipWithIndex.map { case (left, i) =>
      GeoDoc(i + 1, s"place ${i + 1}", 0,
        poly(left, 0, left + boxSize, boxSize),
        left + boxSize / 2, boxSize / 2)
    }
    val others = lefts.zipWithIndex.map { case (left, i) =>
      val s = boxSize + poiDy - 0.001
      GeoDoc(16 + i, s"other ${i + 1}", 0,
        poly(left - 0.001, s, left + boxSize, s + boxSize),
        left + boxSize / 2, s + boxSize / 2)
    }
    val bigPlace = GeoDoc(22222, "place", 0,
      poly(-2, -2, -0.5, -0.5), -1.25, -1.25)
    val pois = lefts.zipWithIndex.map { case (left, i) =>
      GeoDoc(i + 1, "coffee", 0, pt(left, boxSize + poiDy),
        left, boxSize + poiDy)
    }
    val expectedPoi = GeoDoc(11111, "coffee", 0, pt(-1, -1), -1, -1)

    index = IndexBuilder.build(spark, Seq(
      (LayerConfig("place", idx = 0, zoom = 12, typ = "place"),
        docs(places ++ others :+ bigPlace: _*)),
      (LayerConfig("poi", idx = 1, zoom = 14, typ = "poi"),
        docs(pois :+ expectedPoi: _*))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("coffee place: context backfill surfaces the truly-matching poi") {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, "coffee place")).toDF("query_id", "query")
    val res = Forward.forward(spark, index, queries)
      .orderBy(col("rank"))
      .select(col("feature_id"), col("place_name"), col("relev"),
        col("place_type"))
      .as[(Long, String, Double, String)].collect().toSeq
    assert(res.nonEmpty, "no results")
    assert(res.head._1 === 11111L, s"got $res")
    assert(res.head._4 === "poi", s"got $res")
    assert(res.head._2 === "coffee, place", s"got $res")
    assert(res.head._3 === 1.0, s"got $res")
  }

  test("eleven relev-1 stacks exceed one limit_verify batch") {
    // sanity: the fixture really does force a second context chunk —
    // eleven spatialmatches at stack relevance 1 with default
    // limitVerify=10 means the winner may arrive via backfill
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, "coffee place")).toDF("query_id", "query")
    val res = Forward.forward(spark, index, queries,
      Forward.Options(limit = 10))
      .select(col("feature_id")).as[Long].collect().toSeq
    assert(res.contains(11111L), s"got $res")
  }
}
