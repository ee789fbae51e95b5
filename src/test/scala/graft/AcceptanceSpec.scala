package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward

/** Ported reference acceptance fixtures
  * (reference test/acceptance/geocode-unit.order.test.js): five layers, all
  * features on tile 6/32/32, exercising query-order ("backy") relevance and
  * ascending/descending result arbitration.
  */
class AcceptanceSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var index: IndexBuilder.CarmenIndex = _

  private val pt = """{"type":"Point","coordinates":[0,0]}"""

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    import sp.implicits._
    def docs(d: GeoDoc*) = sp.createDataset(d)
    index = IndexBuilder.build(spark, Seq(
      (LayerConfig("country", idx = 0, zoom = 6, typ = "country"),
        docs(GeoDoc(1, "United States", 0, pt, 0, 0))),
      (LayerConfig("region", idx = 1, zoom = 6, typ = "region"),
        docs(GeoDoc(1, "North Carolina", 0, pt, 0, 0))),
      (LayerConfig("place", idx = 2, zoom = 6, typ = "place"),
        docs(GeoDoc(1, "Winston-Salem", 0, pt, 0, 0))),
      (LayerConfig("address", idx = 3, zoom = 6, typ = "address",
        geocoderAddress = true),
        docs(GeoDoc(1, "Log Cabin Ln", 0, pt, 0, 0))),
      (LayerConfig("poi", idx = 4, zoom = 6, typ = "poi"),
        docs(GeoDoc(2, "United States", 0, pt, 0, 0)))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(q: String): Seq[(Int, Double, String, Long, Int)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, index, queries)
      .select(col("rank"), col("relev"), col("place_name"), col("feature_id"),
        col("lead_idx"))
      .as[(Int, Double, String, Long, Int)].collect().toSeq.sortBy(_._1)
  }

  test("'{place} {region}': ascending order keeps relevance 1") {
    val res = fw("Winston-Salem North Carolina")
    assert(res.head._3.startsWith("Winston-Salem"), s"got $res")
    assert(res.head._2 === 1.0, s"got $res")
  }

  test("'{region} {place}': unexpected descending order lowers relevance to 0.99") {
    val res = fw("North Carolina Winston-Salem")
    assert(res.head._3.startsWith("Winston-Salem"), s"got $res")
    assert(res.head._2 === 0.99, s"got $res")
  }

  test("mixed-up order applies the backy penalty") {
    val res = fw("Log Cabin Ln North Carolina Winston-Salem")
    assert(res.head._3.startsWith("Log Cabin Ln"), s"got $res")
    assert(res.head._2 < 0.99, s"backy-penalized: $res")
  }

  test("'North Carolina United States': region wins over descending poi") {
    val res = fw("North Carolina United States")
    assert(res.length >= 2, s"both directions returned: $res")
    assert(res.head._5 === 1 && res.head._4 === 1L, s"first is region.1: $res")
  }

  test("'United States Winston-Salem': ascending poi wins (descending gappy)") {
    val res = fw("United States Winston-Salem")
    assert(res.length >= 2, s"both directions returned: $res")
    assert(res.head._5 === 4 && res.head._4 === 2L, s"first is poi.2: $res")
  }

  // --- gappy stacking fixtures (reference geocode-unit.gappy.test.js) ---
  private var gappy: IndexBuilder.CarmenIndex = _

  private def buildGappy(): IndexBuilder.CarmenIndex = {
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])
    val mp = """{"type":"MultiPoint","coordinates":[[0,0],[14.0625,-2.8079929095776683]]}"""
    val p2 = """{"type":"Point","coordinates":[14.0625,-2.8079929095776683]}"""
    IndexBuilder.build(spark, Seq(
      (LayerConfig("province", idx = 0, zoom = 6, typ = "region"),
        docs(GeoDoc(1, "new york, ny", 0, mp, 0, 0))),
      (LayerConfig("city", idx = 1, zoom = 6, typ = "place"),
        docs(GeoDoc(1, "new york, ny", 0, pt, 0, 0),
          GeoDoc(2, "tonawanda", 0, p2, 14.0625, -2.8079929095776683))),
      (LayerConfig("street", idx = 2, zoom = 6, typ = "street",
        geocoderAddress = true),
        docs(GeoDoc(1, "west st", 0, pt, 0, 0),
          GeoDoc(2, "west st", 0, p2, 14.0625, -2.8079929095776683)))))
  }

  private def fwg(q: String): Seq[(Int, Double, String, Long, Int)] = {
    if (gappy == null) gappy = buildGappy()
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, gappy, queries)
      .select(col("rank"), col("relev"), col("place_name"), col("feature_id"),
        col("lead_idx"))
      .as[(Int, Double, String, Long, Int)].collect().toSeq.sortBy(_._1)
  }

  test("gappy: west st tonawanda ny") {
    val res = fwg("west st tonawanda ny")
    assert(res.head._3 === "west st, tonawanda, new york", s"got $res")
  }

  test("gappy: west st new york ny") {
    val res = fwg("west st new york ny")
    assert(res.head._3 === "west st, new york, new york", s"got $res")
  }

  test("gappy: new york -> province.1") {
    val res = fwg("new york")
    assert(res.head._3 === "new york", s"got $res")
    assert(res.head._5 === 0 && res.head._4 === 1L, s"province.1 first: $res")
  }

  test("gappy: new york new york -> city.1") {
    val res = fwg("new york new york")
    assert(res.head._3 === "new york, new york", s"got $res")
    assert(res.head._5 === 1 && res.head._4 === 1L, s"city.1 first: $res")
  }

  test("gappy: ny ny -> city.1") {
    val res = fwg("ny ny")
    assert(res.head._3 === "new york, new york", s"got $res")
    assert(res.head._5 === 1 && res.head._4 === 1L, s"city.1 first: $res")
  }

  // --- proximity fixtures (reference geocode-unit.proximity.test.js) ----
  private var prox: IndexBuilder.CarmenIndex = _

  private def buildProx(): IndexBuilder.CarmenIndex = {
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])
    def p(lon: Double, lat: Double) = s"""{"type":"Point","coordinates":[$lon,$lat]}"""
    IndexBuilder.build(spark, Seq(
      (LayerConfig("country", idx = 0, zoom = 1, typ = "country"),
        docs(GeoDoc(1, "country", 0, p(-100, 60), -100, 60),
          GeoDoc(2, "country", 0, p(-60, -20), -60, -20),
          GeoDoc(3, "province", 0, p(145, 70), 145, 70))),
      (LayerConfig("province", idx = 1, zoom = 6, typ = "region"),
        docs(GeoDoc(1, "province", 0, p(-80, 40), -80, 40),
          GeoDoc(2, "fakeprov", 0, p(-100, 60), -100, 60),
          GeoDoc(3, "fakeprov", 0, p(-60, -20), -60, -20)))))
  }

  private def fwp(q: String, proximity: Option[(Double, Double)] = None)
      : Seq[(Int, Double, String, Long, Int)] = {
    if (prox == null) prox = buildProx()
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, prox, queries, Forward.Options(proximity = proximity))
      .select(col("rank"), col("relev"), col("place_name"), col("feature_id"),
        col("lead_idx"))
      .as[(Int, Double, String, Long, Int)].collect().toSeq.sortBy(_._1)
  }

  test("proximity: forward without proximity prefers country.2 (grid order)") {
    val res = fwp("country")
    assert(res.head._4 === 2L && res.head._5 === 0, s"country.2 first: $res")
    assert(res.head._2 === 1.0)
  }

  test("proximity: [-60,-20] keeps country.2") {
    val res = fwp("country", Some((-60.0, -20.0)))
    assert(res.head._4 === 2L, s"country.2 first: $res")
    assert(res.head._2 === 1.0)
  }

  test("proximity: [-100,60] flips to country.1") {
    val res = fwp("country", Some((-100.0, 60.0)))
    assert(res.head._4 === 1L, s"country.1 first: $res")
    assert(res.head._2 === 1.0)
  }

  test("proximity: 'province' without proximity prefers lower typeindex (country.3)") {
    val res = fwp("province")
    assert(res.head._4 === 3L && res.head._5 === 0, s"country.3 first: $res")
    assert(res.head._2 === 1.0)
  }

  test("proximity: 'province' near [-80,40] flips to province.1 across layers") {
    val res = fwp("province", Some((-80.0, 40.0)))
    assert(res.head._4 === 1L && res.head._5 === 1, s"province.1 first: $res")
  }
}
