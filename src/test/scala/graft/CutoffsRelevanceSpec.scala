package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.TokenSpec
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward

/** Ported relevance-cutoff acceptance fixtures:
  *
  *  - reference test/acceptance/geocode-unit.lowrelev.test.js — equal-relev
  *    phrasematch results are held to the 0.5 relevance bar, not 0.75;
  *  - geocode-unit.strictloose.test.js — "albany australia" reports the
  *    relevance of albany+australia (1.0) even though the verified context
  *    runs through western australia;
  *  - geocode-unit.relevance.test.js — an unmatched apartment-number tail
  *    lowers relevance to 0.648148; without it relevance is 1;
  *  - geocode-unit.cutoffs.test.js — max_correction_length gates the fuzzy
  *    edit budget by query token count, and verifymatch_stack_limit bounds
  *    how many stacks are verified.
  */
class CutoffsRelevanceSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var lowrelev: IndexBuilder.CarmenIndex = _
  private var loose: IndexBuilder.CarmenIndex = _
  private var relevance: IndexBuilder.CarmenIndex = _
  private var cutoffs: IndexBuilder.CarmenIndex = _

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
  private def tilePoly(z: Int, tiles: (Int, Int)*): String = {
    def ring(x: Int, y: Int): String = {
      val (w, e) = (tileLon(z, x), tileLon(z, x + 1))
      val (n, s) = (tileLat(z, y), tileLat(z, y + 1))
      s"[[[$w,$s],[$e,$s],[$e,$n],[$w,$n],[$w,$s]]]"
    }
    tiles.map { case (x, y) => ring(x, y) }
      .mkString("""{"type":"MultiPolygon","coordinates":[""", ",", "]}")
  }

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])

    lowrelev = IndexBuilder.build(spark, Seq(
      (LayerConfig("country", idx = 0, zoom = 6, typ = "country"),
        docs(
          GeoDoc(1, "czech republic", 0, tilePoly(6, (32, 32)), 0, 0),
          GeoDoc(2, "fake country two", 0, tilePoly(7, (32, 32)), 0, 0)))))

    loose = IndexBuilder.build(spark, Seq(
      (LayerConfig("country", idx = 0, zoom = 6, typ = "country"),
        docs(GeoDoc(1, "australia", 0, tilePoly(6, (32, 32)), 0, 0))),
      (LayerConfig("province", idx = 1, zoom = 6, typ = "province"),
        docs(GeoDoc(2, "western australia", 0, tilePoly(6, (32, 32)), 0, 0))),
      (LayerConfig("place", idx = 2, zoom = 6, typ = "place"),
        docs(GeoDoc(3, "albany", 0, tilePoly(6, (32, 32)), 0, 0)))))

    relevance = IndexBuilder.build(spark, Seq(
      (LayerConfig("country", idx = 0, zoom = 6, typ = "country"),
        docs(GeoDoc(1, "United States", 0, tilePoly(6, (32, 32)), 0, 0))),
      (LayerConfig("region", idx = 1, zoom = 6, typ = "region"),
        docs(GeoDoc(1, "Colorado", 0, tilePoly(6, (32, 32)), 0, 0))),
      (LayerConfig("postcode", idx = 2, zoom = 6, typ = "postcode"),
        docs(GeoDoc(1, "80138", 0, tilePoly(6, (32, 32)), 0, 0))),
      (LayerConfig("place", idx = 3, zoom = 6, typ = "place"),
        docs(GeoDoc(1, "Parker", 0, tilePoly(6, (32, 32)), 0, 0))),
      (LayerConfig("address", idx = 4, zoom = 6, typ = "address",
        geocoderAddress = true,
        geocoderTokens = Seq("Drive" -> TokenSpec("Dr")),
        geocoderFormat = "{{country.name}}, {{region.name}}{{place.name}}{{address.name}}{{address.number}}"),
        docs(GeoDoc(1, "S Pikes Peak Dr", 0, mpt((0, 0)), 0, 0,
          addressnumber = Seq(Seq("11027")))))))

    cutoffs = IndexBuilder.build(spark, Seq(
      (LayerConfig("country", idx = 0, zoom = 6, typ = "country"),
        docs(
          GeoDoc(1, "United States", 0, tilePoly(6, (32, 32)), 0, 0),
          GeoDoc(2, "United Kingdom", 0, tilePoly(6, (32, 32)), 0, 1))),
      (LayerConfig("place", idx = 1, zoom = 6, typ = "place"),
        docs(((1 to 11).map(i =>
          GeoDoc(i, s"place $i", 0, pt(0, 0), 0, 0)) :+
          GeoDoc(50, "place 1", 0, pt(0, 1), 0, 1)): _*))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(idx: IndexBuilder.CarmenIndex, q: String,
                 opts: Forward.Options = Forward.Options()): Seq[(String, Long, Double, Double, Double)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, idx, queries, opts)
      .select(col("place_name"), col("feature_id"), col("relev"),
        col("center_lon"), col("center_lat"))
      .as[(String, Long, Double, Double, Double)].collect().toSeq
  }

  // --- lowrelev.test.js ---

  test("lowrelev: czech => czech republic") {
    val res = fw(lowrelev, "czech", Forward.Options(limitVerify = 1))
    assert(res.head._1 === "czech republic" && res.head._2 === 1L, s"got $res")
  }

  test("lowrelev: fake blah blah => no result (under the 0.5 bar)") {
    val res = fw(lowrelev, "fake blah blah", Forward.Options(limitVerify = 1))
    assert(res.isEmpty, s"got $res")
  }

  // --- strictloose.test.js ---

  test("strictloose: albany australia reports the loose relevance 1.0") {
    val res = fw(loose, "albany australia")
    assert(res.head._1 === "albany, western australia, australia", s"got $res")
    assert(res.head._3 === 1.0, s"got $res")
  }

  // --- relevance.test.js ---

  test("relevance: apartment number lowers relevance to 0.648148") {
    val res = fw(relevance, "11027 S. Pikes Peak Drive #201",
      Forward.Options(limitVerify = 1))
    assert(res.nonEmpty, "no result")
    assert(math.abs(res.head._3 - 0.648148) < 1e-6, s"got $res")
  }

  test("relevance: full address match keeps relevance 1") {
    val res = fw(relevance, "11027 S. Pikes Peak Drive",
      Forward.Options(limitVerify = 1))
    assert(res.nonEmpty, "no result")
    assert(res.head._3 === 1.0, s"got $res")
  }

  // --- cutoffs.test.js ---

  test("cutoffs: max_correction_length=0 disables fuzzy for a long query") {
    val res = fw(cutoffs, "place places 11 unitted states america however extreme",
      Forward.Options(maxCorrectionLength = 0))
    assert(res.nonEmpty, "no result")
    assert(res.head._3 < 0.6, s"got $res")
  }

  test("cutoffs: fuzzy correction applies under max_correction_length") {
    val res = fw(cutoffs, "places places 11 unitted states america")
    assert(res.head._1 === "place 11, United States", s"got $res")
  }

  test("cutoffs: verifymatch_stack_limit=1 keeps only the US place 1") {
    val res = fw(cutoffs, "place 1 united",
      Forward.Options(stackLimit = 1))
    assert(res.head._1 === "place 1, United States", s"got $res")
    assert((res.head._4, res.head._5) === ((0.0, 0.0)), s"got $res")
    assert(!res.exists(r => r._5 === 1.0), s"got $res")
  }

  test("cutoffs: verifymatch_stack_limit=30 includes the UK place 1") {
    val res = fw(cutoffs, "place 1 united",
      Forward.Options(stackLimit = 30))
    assert(res.head._1 === "place 1, United States", s"got $res")
    assert((res.head._4, res.head._5) === ((0.0, 0.0)), s"got $res")
    assert(res.exists(r => r._5 === 1.0), s"got $res")
  }
}
