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
  *  - reference test/acceptance/geocode-unit.proximity-polygon.test.js —
  *    with a proximity point outside three multi-tile polygons, scoredist
  *    uses the nearest matched cover (not the shared center), ordering
  *    san diego > san jose > san francisco;
  *  - geocode-unit.spatialmatch-stack-length.test.js — with
  *    spatialmatch_stack_limit=5 the two-layer place+region stack survives
  *    the cutoff against a pile of fuzzy single-layer poi stacks.
  */
class ProximityPolygonSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var poly3: IndexBuilder.CarmenIndex = _
  private var stacks: IndexBuilder.CarmenIndex = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])

    val all = for (k <- 2048 until 2080; l <- 2048 until 2080) yield (k, l)
    val t1 = all.slice(0, 341)
    val t2 = all.slice(341, 682)
    val t3 = all.slice(682, all.length)
    poly3 = IndexBuilder.build(spark, Seq(
      (LayerConfig("place", idx = 0, zoom = 12, typ = "place",
        maxscore = 1670000),
        docs(
          GeoDoc(1, "san francisco", 8033, tilePoly(12, t1: _*), 2, -1),
          GeoDoc(2, "san diego", 7891, tilePoly(12, t2: _*), 2, -1),
          GeoDoc(3, "san jose", 3877, tilePoly(12, t3: _*), 2, -1)))))

    val t32 = tilePoly(6, (32, 32))
    val poiTile = tilePoly(14, (8320, 8320))
    stacks = IndexBuilder.build(spark, Seq(
      (LayerConfig("region2", idx = 0, zoom = 6, typ = "region",
        geocoderName = "region2"),
        docs(GeoDoc(1, "ca", 0, tilePoly(6, (1, 1)), 0, 0))),
      (LayerConfig("region3", idx = 1, zoom = 6, typ = "region",
        geocoderName = "region3"),
        docs(GeoDoc(1, "francisco ca", 0, tilePoly(6, (2, 2)), 0, 0))),
      (LayerConfig("region4", idx = 2, zoom = 6, typ = "region",
        geocoderName = "region4"),
        docs(GeoDoc(1, "cal", 0, tilePoly(6, (5, 5)), 0, 0))),
      (LayerConfig("region", idx = 3, zoom = 6, typ = "region"),
        docs(GeoDoc(1, "california", 0, t32, 0, 0))),
      (LayerConfig("place", idx = 4, zoom = 6, typ = "place"),
        docs(GeoDoc(2, "san francisco", 500, t32, 2.82, -2.84))),
      (LayerConfig("poi", idx = 5, zoom = 14, typ = "poi",
        geocoderName = "poi"),
        docs(GeoDoc(1, "san francisco cable car 1", 0, poiTile, 2.82, -2.84))),
      (LayerConfig("poi2", idx = 6, zoom = 14, typ = "poi",
        geocoderName = "poi2"),
        docs(GeoDoc(2, "sen francisco cable car 2", 0, poiTile, 2.82, -2.84))),
      (LayerConfig("poi3", idx = 7, zoom = 14, typ = "poi",
        geocoderName = "poi3"),
        docs(GeoDoc(2, "sen francisco cable car 2", 0, poiTile, 2.82, -2.84))),
      (LayerConfig("poi4", idx = 8, zoom = 14, typ = "poi",
        geocoderName = "poi4"),
        docs(GeoDoc(2, "sen francisco cable car 2", 0, poiTile, 2.82, -2.84)))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("proximity-polygon: nearest matched cover drives scoredist order") {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, "san")).toDF("query_id", "query")
    val res = Forward.forward(spark, poly3, queries,
      Forward.Options(proximity = Some((3.0, -3.0))))
      .select(col("feature_id")).as[Long].collect().toSeq
    assert(res === Seq(2L, 3L, 1L), s"got $res")
  }

  test("stack-length: place+region stack survives spatialmatch_stack_limit=5") {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, "san francisco ca")).toDF("query_id", "query")
    val res = Forward.forward(spark, stacks, queries,
      Forward.Options(proximity = Some((0.0, 0.0)), spatialmatchStackLimit = 5))
      .select(col("place_type"), col("feature_id"))
      .as[(String, Long)].collect().toSeq
    assert(res.nonEmpty, "no result")
    assert(res.head === (("place", 2L)), s"got $res")
  }
}
