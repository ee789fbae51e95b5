package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.{Forward, Reverse}

/** Ported limit acceptance fixtures (reference
  * test/acceptance/geocode-unit.limit.test.js): forward default 5 / hard
  * cap 10; reverse suffix contexts; limit reverse requires one type, caps
  * at 5, orders nearest-first, and address clusters contribute their
  * individual points.
  */
class LimitAcceptanceSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var many: IndexBuilder.CarmenIndex = _     // 20 places
  private var seneca: IndexBuilder.CarmenIndex = _   // poi/address/place

  private def poly(w: Double, s: Double, e: Double, n: Double): String =
    s"""{"type":"Polygon","coordinates":[[[$w,$s],[$e,$s],[$e,$n],[$w,$n],[$w,$s]]]}"""
  private def pt(lon: Double, lat: Double): String =
    s"""{"type":"Point","coordinates":[$lon,$lat]}"""

  private val coords = Vector(
    (-79.37663912773132, 38.83417524443351),
    (-79.37698781490326, 38.83414599360498),
    (-79.37705218791960, 38.83398302448309),
    (-79.37690734863281, 38.83439671460232),
    (-79.37739551067352, 38.83437582121962),
    (-79.37776565551758, 38.83445939471365),
    (-79.37820553779602, 38.83435910650903),
    (-79.37737405300139, 38.83381587627815),
    (-79.37737941741943, 38.83361111919213),
    (-79.37780320644379, 38.83375319560010))
  private val qLon = -79.37745451927184
  private val qLat = 38.83420867393712

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])
    many = IndexBuilder.build(spark, Seq(
      (LayerConfig("country", idx = 0, zoom = 6, typ = "country"),
        docs(GeoDoc(1, "United States", 0, poly(0, -5, 5, -0.01), 2, -2))),
      (LayerConfig("place", idx = 1, zoom = 6, typ = "place"),
        docs((1 until 21).map(i =>
          GeoDoc(i, s"place $i", 0, pt(0.1, -0.1), 0.1, -0.1)): _*))))
    val mp = coords.map(c => s"[${c._1},${c._2}]").mkString(",")
    seneca = IndexBuilder.build(spark, Seq(
      (LayerConfig("place", idx = 0, zoom = 6, typ = "place"),
        docs(GeoDoc(1, "west virginia", 0,
          poly(-84.375, 36.6, -78.75, 40.97), -79.379, 38.833))),
      (LayerConfig("address", idx = 1, zoom = 12, typ = "address",
        geocoderAddress = true),
        docs(GeoDoc(1, "main road", 0,
          s"""{"type":"GeometryCollection","geometries":[{"type":"MultiPoint","coordinates":[$mp]}]}""",
          coords(0)._1, coords(0)._2,
          addressnumber = Seq((1 to 10).map(_.toString))))),
      (LayerConfig("poi", idx = 2, zoom = 12, typ = "poi"),
        docs((1 until 6).map(i =>
          GeoDoc(i, s"seneca rocks $i", 0, pt(coords(i - 1)._1, coords(i - 1)._2),
            coords(i - 1)._1, coords(i - 1)._2)): _*))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(limit: Int): Seq[String] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, "place")).toDF("query_id", "query")
    Forward.forward(spark, many, queries, Forward.Options(limit = limit))
      .orderBy(col("rank")).select(col("place_name")).as[String].collect().toSeq
  }

  test("forward: default 5, limit 1, limit 10, hard cap at 10") {
    val d = fw(5)
    assert(d.length === 5 && d.distinct.length === 5, s"got $d")
    assert(fw(1).length === 1)
    val ten = fw(10)
    assert(ten.length === 10 && ten.distinct.length === 10, s"got $ten")
    assert(fw(11).length === 10, "hard limit of 10")
  }

  test("reverse: full suffix-context splitting with address snap") {
    val sp = spark; import sp.implicits._
    val pts = Seq((1L, qLon, qLat)).toDF("query_id", "lon", "lat")
    val res = Reverse.reverse(spark, seneca, pts)
      .select(col("rank"), col("place_name")).as[(Int, String)]
      .collect().sortBy(_._1).map(_._2).toSeq
    assert(res === Seq(
      "seneca rocks 5, main road, west virginia",
      "5 main road, west virginia",
      "west virginia"), s"got $res")
  }

  test("limit reverse requires a single type") {
    assert(Reverse.validateReverseOptions(
      Reverse.ReverseOptions(limit = 2), explicitLimit = true)
      .exists(_.contains("limit must be combined with a single type")))
    assert(Reverse.validateReverseOptions(
      Reverse.ReverseOptions(limit = 2, types = Seq("poi")),
      explicitLimit = true).isEmpty)
  }

  test("limit reverse: nearest pois in distance order, capped at 5") {
    val sp = spark; import sp.implicits._
    val pts = Seq((1L, qLon, qLat)).toDF("query_id", "lon", "lat")
    def run(limit: Int): Seq[String] =
      Reverse.reverseLimit(spark, seneca, pts, "poi", limit)
        .orderBy(col("rank")).select(col("place_name"))
        .as[String].collect().toSeq
    assert(run(2).length === 2)
    val five = run(5)
    assert(five === Seq(
      "seneca rocks 5, main road, west virginia",
      "seneca rocks 2, main road, west virginia",
      "seneca rocks 3, main road, west virginia",
      "seneca rocks 4, main road, west virginia",
      "seneca rocks 1, main road, west virginia"), s"got $five")
    assert(run(6) === five, "hard limit of 5")
  }

  test("limit reverse on an address type returns individual cluster points") {
    val sp = spark; import sp.implicits._
    val pts = Seq((1L, qLon, qLat)).toDF("query_id", "lon", "lat")
    val res = Reverse.reverseLimit(spark, seneca, pts, "address", 5)
      .orderBy(col("rank")).select(col("place_name"))
      .as[String].collect().toSeq
    assert(res === Seq(
      "5 main road, west virginia",
      "6 main road, west virginia",
      "2 main road, west virginia",
      "3 main road, west virginia",
      "8 main road, west virginia"), s"got $res")
  }
}
