package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward

/** Ported stacking acceptance fixtures:
  *
  *  - reference test/acceptance/geocode-unit.stacky.test.js — "Windsor CT"
  *    (city + province synonym stack) beats "Windsor Ct" (street) at
  *    context sort; the street wins when the query names it fully;
  *  - geocode-unit.gappy.test.js — gappy stacking ("west st new york"
  *    stacks street + city across a token gap) and city-vs-province
  *    disambiguation for "new york (new york)";
  *  - geocode-unit.spatialmatch.test.js — the highest relev for a stacked
  *    zxy cell wins: a lower-relev cell cannot overwrite a previous entry;
  *  - geocode-unit.fallback.test.js — when an address query's tail
  *    (postcode/place/region) aligns on one city but the street matches
  *    another, the deeper matching stack wins.
  */
class StackyGappySpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var stacky: IndexBuilder.CarmenIndex = _
  private var gappy: IndexBuilder.CarmenIndex = _
  private var spatial: IndexBuilder.CarmenIndex = _
  private var fallback: IndexBuilder.CarmenIndex = _

  private def pt(lon: Double, lat: Double): String =
    s"""{"type":"Point","coordinates":[$lon,$lat]}"""
  private def mpt(pts: (Double, Double)*): String =
    pts.map { case (x, y) => s"[$x,$y]" }
      .mkString("""{"type":"MultiPoint","coordinates":[""", ",", "]}")

  private def tileLon(z: Int, x: Double): Double = x / (1L << z) * 360.0 - 180.0
  private def tileLat(z: Int, y: Double): Double = {
    val yf = y / (1L << z)
    math.toDegrees(math.atan(math.sinh(math.Pi * (1 - 2 * yf))))
  }

  /** Tile-box MultiPolygon for carmen:zxy-only fixtures (the reference test
    * helper's synthesized geometry, lib/indexer/addfeature.js:104-117).
    */
  private def tilePoly(z: Int, tiles: (Int, Int)*): String = {
    def ring(x: Int, y: Int): String = {
      val (w, e) = (tileLon(z, x), tileLon(z, x + 1))
      val (n, s) = (tileLat(z, y), tileLat(z, y + 1))
      s"[[[$w,$s],[$e,$s],[$e,$n],[$w,$n],[$w,$s]]]"
    }
    tiles.map { case (x, y) => ring(x, y) }
      .mkString("""{"type":"MultiPolygon","coordinates":[""", ",", "]}")
  }

  // center of tile 6/34/32 (the gappy/stacky fixtures' second tile)
  private val t34 = (14.0625, -2.8079929095776683)

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])

    stacky = IndexBuilder.build(spark, Seq(
      (LayerConfig("province", idx = 0, zoom = 6, typ = "province"),
        docs(GeoDoc(1, "connecticut, court", 0, tilePoly(6, (32, 32)), 0, 0))),
      (LayerConfig("city", idx = 1, zoom = 6, typ = "city"),
        docs(GeoDoc(1, "windsor", 0, tilePoly(6, (32, 32), (34, 32)), 0, 0))),
      (LayerConfig("street", idx = 2, zoom = 6, typ = "street",
        geocoderAddress = true),
        docs(GeoDoc(1, "windsor court", 0, tilePoly(6, (34, 32)), 360.0 / 32, 0)))))

    gappy = IndexBuilder.build(spark, Seq(
      (LayerConfig("province", idx = 0, zoom = 6, typ = "province"),
        docs(GeoDoc(1, "new york, ny", 0, tilePoly(6, (32, 32), (34, 32)), 0, 0))),
      (LayerConfig("city", idx = 1, zoom = 6, typ = "city"),
        docs(
          GeoDoc(1, "new york, ny", 0, tilePoly(6, (32, 32)), 0, 0),
          GeoDoc(2, "tonawanda", 0, tilePoly(6, (34, 32)), t34._1, t34._2))),
      (LayerConfig("street", idx = 2, zoom = 6, typ = "street",
        geocoderAddress = true),
        docs(
          GeoDoc(1, "west st", 0, tilePoly(6, (32, 32)), 0, 0),
          GeoDoc(2, "west st", 0, tilePoly(6, (34, 32)), t34._1, t34._2)))))

    spatial = IndexBuilder.build(spark, Seq(
      (LayerConfig("place", idx = 0, zoom = 6, typ = "place"),
        docs(GeoDoc(1, "fakecity", 0, tilePoly(6, (32, 32)), 0, 0))),
      (LayerConfig("address", idx = 1, zoom = 6, typ = "address",
        geocoderAddress = true),
        docs(
          GeoDoc(2, "fake street", 0, mpt((0, 0)),
            0, 0, addressnumber = Seq(Seq("1"))),
          GeoDoc(3, "fake street", 0, mpt((0, 0)), 0, 0,
            addressnumber = Seq(Seq("2")))))))

    val cold = (10.0, 0.0)
    val seattle = (0.0, 0.0)
    fallback = IndexBuilder.build(spark, Seq(
      (LayerConfig("region", idx = 0, zoom = 6, typ = "region"),
        docs(GeoDoc(100, "Washington", 0, pt(seattle._1, seattle._2), 0, 0))),
      (LayerConfig("place", idx = 1, zoom = 6, typ = "place"),
        docs(
          GeoDoc(105, "Cold City", 0, pt(cold._1, cold._2), cold._1, cold._2),
          GeoDoc(100, "Seattle", 0, pt(seattle._1, seattle._2), 0, 0))),
      (LayerConfig("postcode", idx = 2, zoom = 6, typ = "postcode"),
        docs(GeoDoc(100, "12345", 0, pt(seattle._1, seattle._2), 0, 0))),
      (LayerConfig("address", idx = 3, zoom = 6, typ = "address",
        geocoderAddress = true),
        docs(
          GeoDoc(100, "Main St", 0, mpt(cold), cold._1, cold._2,
            addressnumber = Seq(Seq("100"))),
          GeoDoc(101, "Market", 0, mpt(cold), cold._1, cold._2,
            addressnumber = Seq(Seq("100")))))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(idx: IndexBuilder.CarmenIndex, q: String,
                 limitVerify: Int = 10): Seq[(String, String, Long, Double)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, idx, queries,
      Forward.Options(limitVerify = limitVerify))
      .select(col("place_name"), col("place_type"), col("feature_id"),
        col("relev"))
      .as[(String, String, Long, Double)].collect().toSeq
  }

  // --- stacky.test.js ---

  test("stacky: 'windsor court' - city+province stack beats the street") {
    val res = fw(stacky, "windsor court", limitVerify = 2)
    assert(res.head._1 === "windsor, connecticut", s"got $res")
    assert(res.head._2 === "city" && res.head._3 === 1L, s"got $res")
  }

  test("stacky: 'windsor court windsor' - street wins with full name") {
    val res = fw(stacky, "windsor court windsor", limitVerify = 2)
    assert(res.head._1 === "windsor court, windsor", s"got $res")
    assert(res.head._2 === "street" && res.head._3 === 1L, s"got $res")
    assert(res.head._4 === 1.0, s"got $res")
  }

  // --- gappy.test.js ---

  test("gappy: west st tonawanda ny") {
    val res = fw(gappy, "west st tonawanda ny", limitVerify = 1)
    assert(res.head._1 === "west st, tonawanda, new york", s"got $res")
  }

  test("gappy: west st new york ny") {
    val res = fw(gappy, "west st new york ny", limitVerify = 1)
    assert(res.head._1 === "west st, new york, new york", s"got $res")
  }

  test("gappy: new york -> province") {
    val res = fw(gappy, "new york", limitVerify = 1)
    assert(res.head._1 === "new york", s"got $res")
    assert(res.head._2 === "province" && res.head._3 === 1L, s"got $res")
  }

  test("gappy: new york new york -> city") {
    val res = fw(gappy, "new york new york", limitVerify = 2)
    assert(res.head._1 === "new york, new york", s"got $res")
    assert(res.head._2 === "city" && res.head._3 === 1L, s"got $res")
  }

  test("gappy: ny ny -> city") {
    val res = fw(gappy, "ny ny", limitVerify = 2)
    assert(res.head._1 === "new york, new york", s"got $res")
    assert(res.head._2 === "city" && res.head._3 === 1L, s"got $res")
  }

  test("gappy: new york ny -> city") {
    val res = fw(gappy, "new york ny", limitVerify = 2)
    assert(res.head._1 === "new york, new york", s"got $res")
    assert(res.head._2 === "city" && res.head._3 === 1L, s"got $res")
  }

  // --- spatialmatch.test.js ---

  test("spatialmatch: highest relev for a stacked cell wins") {
    val res = fw(spatial, "1 fake street fakecity", limitVerify = 1)
    assert(res.length === 1, s"got $res")
    assert(res.head._4 === 1.0, s"got $res")
    assert(res.head._2 === "address" && res.head._3 === 2L, s"got $res")
  }

  // --- fallback.test.js ---

  test("fallback: 3(Cold City) vs 3(Seattle) -> postcode stack wins") {
    val res = fw(fallback, "100 Main St, 12345 Seattle, Washington", limitVerify = 1)
    assert(res.length === 1, s"got $res")
    assert(res.head._1 === "12345, Seattle, Washington", s"got $res")
    assert(res.head._2 === "postcode" && res.head._3 === 100L, s"got $res")
  }

  test("fallback: 2(Cold City) vs 3(Seattle) -> postcode stack wins") {
    val res = fw(fallback, "100 Market 12345 Seattle Washington", limitVerify = 1)
    assert(res.length === 1, s"got $res")
    assert(res.head._1 === "12345, Seattle, Washington", s"got $res")
    assert(res.head._2 === "postcode" && res.head._3 === 100L, s"got $res")
  }

  test("fallback: 3(Cold City) vs 2(Seattle) -> place stack wins") {
    val res = fw(fallback, "100 Main St, Seattle Washington", limitVerify = 1)
    assert(res.length === 1, s"got $res")
    assert(res.head._1 === "Seattle, Washington", s"got $res")
    assert(res.head._2 === "place" && res.head._3 === 100L, s"got $res")
  }
}
