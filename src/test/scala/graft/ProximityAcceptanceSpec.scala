package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward

/** Ported proximity acceptance fixtures:
  *
  *  - reference test/acceptance/geocode-unit.proximity.test.js — the
  *    proximity flag flips which same-named feature wins (scoredist trumps
  *    idx hierarchy), across single- and multi-layer queries;
  *  - geocode-unit.prox_match.test.js — with a proximity point inside one
  *    source's bounds, that source's feature outranks same-relev features
  *    of sibling sources sharing a geocoder_name;
  *  - geocode-unit.proximity-cutoff.test.js — the proximity-aware sort
  *    happens BEFORE the per-stack context cap, so the closest (but
  *    lower-scored) of 101 same-phrase features survives the cutoff;
  *  - geocode-unit.zeroscore.test.js — an all-zero-score index still
  *    geocodes;
  *  - geocode-unit.tile-edge.test.js — a z14 feature at a tile edge is
  *    found with relevance 1.
  */
class ProximityAcceptanceSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var prox: IndexBuilder.CarmenIndex = _      // proximity.test.js
  private var proxMatch: IndexBuilder.CarmenIndex = _ // prox_match.test.js
  private var cutoff: IndexBuilder.CarmenIndex = _    // proximity-cutoff
  private var zero: IndexBuilder.CarmenIndex = _      // zeroscore
  private var edge: IndexBuilder.CarmenIndex = _      // tile-edge

  private def pt(lon: Double, lat: Double): String =
    s"""{"type":"Point","coordinates":[$lon,$lat]}"""

  private def tileLon(z: Int, x: Double): Double = x / (1L << z) * 360.0 - 180.0
  private def tileLat(z: Int, y: Double): Double = {
    val yf = y / (1L << z)
    math.toDegrees(math.atan(math.sinh(math.Pi * (1 - 2 * yf))))
  }

  /** Tile-box polygon ring for (z,x,y) — the reference test helper
    * synthesizes a MultiPolygon of carmen:zxy tile boxes for fixtures with
    * no geometry (reference lib/indexer/addfeature.js:104-117).
    */
  private def tileRing(z: Int, x: Int, y: Int): String = {
    val (w, e) = (tileLon(z, x), tileLon(z, x + 1))
    val (n, s) = (tileLat(z, y), tileLat(z, y + 1))
    s"[[$w,$s],[$e,$s],[$e,$n],[$w,$n],[$w,$s]]"
  }
  private def tilePoly(z: Int, tiles: (Int, Int)*): String =
    tiles.map { case (x, y) => s"[${tileRing(z, x, y)}]" }
      .mkString("""{"type":"MultiPolygon","coordinates":[""", ",", "]}")

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])

    prox = IndexBuilder.build(spark, Seq(
      (LayerConfig("country", idx = 0, zoom = 1, typ = "country"),
        docs(
          GeoDoc(1, "country", 0, tilePoly(1, (0, 0)), -100, 60),
          GeoDoc(2, "country", 0, tilePoly(1, (0, 1)), -60, -20),
          GeoDoc(3, "province", 0, tilePoly(1, (1, 0)), 145, 70))),
      (LayerConfig("province", idx = 1, zoom = 6, typ = "province"),
        docs(
          GeoDoc(1, "province", 0, tilePoly(6, (17, 24)), -80, 40),
          GeoDoc(2, "fakeprov", 0, tilePoly(6, (14, 18)), -100, 60),
          GeoDoc(3, "fakeprov", 0, tilePoly(6, (21, 35)), -60, -20)))))

    val poiBounds = Seq(-26.191406, -17.140790, 33.574219, 8.754795)
    val goodBounds = Seq(-106.171875, 30.297018, -53.085938, 54.059388)
    proxMatch = IndexBuilder.build(spark,
      (1 to 6).map { i =>
        (LayerConfig(s"poi$i", idx = i - 1, zoom = 6, typ = s"poi$i",
          geocoderName = "poi", bounds = poiBounds),
          docs(GeoDoc(1, "poi", 0, pt(0, 0), 0, 0)))
      } :+
        ((LayerConfig("good", idx = 6, zoom = 6, typ = "good",
          geocoderName = "poi", bounds = goodBounds),
          docs(GeoDoc(1, "poi I am good", 0,
            pt(-81.74573, 41.49342), -81.74573, 41.49342)))))

    cutoff = IndexBuilder.build(spark, Seq(
      (LayerConfig("place", idx = 0, zoom = 12, typ = "place",
        maxscore = 1670000),
        docs(((1980 until 2080).map { i =>
          GeoDoc(i, "san francisco", 4, tilePoly(12, (i, i)), 0, 0)
        } :+
          GeoDoc(2080, "san francisco", 3, tilePoly(12, (2080, 2080)), 0, 0)): _*))))

    zero = IndexBuilder.build(spark, Seq(
      (LayerConfig("place", idx = 0, zoom = 6, typ = "place"),
        docs(GeoDoc(1, "Chicago", 0, tilePoly(6, (32, 32)), 0, 0)))))

    edge = IndexBuilder.build(spark, Seq(
      (LayerConfig("test", idx = 0, zoom = 14, typ = "test"),
        docs(GeoDoc(1, "test", 0, tilePoly(14, (8093, 5301)),
          -2.17405858745506, 53.4619151830114)))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(idx: IndexBuilder.CarmenIndex, q: String,
                 proximity: Option[(Double, Double)] = None,
                 limit: Int = 5): Seq[(String, String, Long, Double)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, idx, queries,
      Forward.Options(limit = limit, proximity = proximity))
      .select(col("place_name"), col("place_type"), col("feature_id"),
        col("relev"))
      .as[(String, String, Long, Double)].collect().toSeq
  }

  // --- proximity.test.js ---

  test("forward country - no proximity: country.2 wins the grid-id tie") {
    val res = fw(prox, "country")
    assert(res.head._1 === "country" && res.head._3 === 2L, s"got $res")
    assert(res.head._4 === 1.0)
  }

  test("forward country - proximity at country.2 keeps country.2") {
    val res = fw(prox, "country", proximity = Some((-60.0, -20.0)))
    assert(res.head._3 === 2L && res.head._2 === "country", s"got $res")
  }

  test("forward country - proximity at country.1 flips to country.1") {
    val res = fw(prox, "country", proximity = Some((-100.0, 60.0)))
    assert(res.head._3 === 1L && res.head._2 === "country", s"got $res")
  }

  test("forward province - no proximity: coarser idx wins (country.3)") {
    val res = fw(prox, "province")
    assert(res.head._1 === "province", s"got $res")
    assert(res.head._2 === "country" && res.head._3 === 3L, s"got $res")
  }

  test("forward province - proximity: scoredist trumps idx hierarchy") {
    val res = fw(prox, "province", proximity = Some((-80.0, 40.0)))
    assert(res.head._1 === "province, country", s"got $res")
    assert(res.head._2 === "province" && res.head._3 === 1L, s"got $res")
  }

  test("fakeprov country - proximity picks the near fakeprov (province.2)") {
    val res = fw(prox, "fakeprov country", proximity = Some((-100.0, 60.0)), limit = 1)
    assert(res.head._1 === "fakeprov, country", s"got $res")
    assert(res.head._2 === "province" && res.head._3 === 2L, s"got $res")
    assert(res.head._4 === 1.0)
  }

  test("fakeprov country - proximity picks the far fakeprov (province.3)") {
    val res = fw(prox, "fakeprov country", proximity = Some((-60.0, -20.0)), limit = 1)
    assert(res.head._1 === "fakeprov, country", s"got $res")
    assert(res.head._2 === "province" && res.head._3 === 3L, s"got $res")
  }

  // --- prox_match.test.js ---

  test("prox_match: proximityless query does not pick the good source") {
    val res = fw(proxMatch, "poi")
    assert(res.nonEmpty && res.head._2 != "good", s"got $res")
  }

  test("prox_match: proximity inside the good source's bounds picks good.1") {
    val res = fw(proxMatch, "poi", proximity = Some((-81.74573, 41.49342)))
    assert(res.head._2 === "good" && res.head._3 === 1L, s"got $res")
  }

  // --- proximity-cutoff.test.js ---

  test("proximity-cutoff: closest feature survives the context cap") {
    val res = fw(cutoff, "san", proximity = Some((3.0, -3.0)))
    assert(res.head._3 === 2080L, s"got ${res.take(3)}")
  }

  // --- zeroscore.test.js ---

  test("zeroscore: all-zero-score index still geocodes") {
    val res = fw(zero, "chicago", limit = 1)
    assert(res.length === 1 && res.head._3 === 1L, s"got $res")
  }

  // --- tile-edge.test.js ---

  test("tile-edge: z14 feature at a tile edge is found with relevance 1") {
    val res = fw(edge, "test", limit = 1)
    assert(res.head._1 === "test" && res.head._3 === 1L, s"got $res")
    assert(res.head._4 === 1.0)
  }
}
