package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.TokenSpec
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward

/** Token replacement x fuzzy x autocomplete interplay, ported from
  * test/acceptance/geocode-unit.fuzzy-with-tokens-and-autocomplete.js:
  * replaced words index as variants, a typed short abbreviation fuzzy-
  * corrects against them ('30th stn'), a REPLACED last word forces the
  * wordBoundaryPrefix ending whose final word must match exactly ('30th
  * station' -> zero results), and prefix/fuzzy-prefix compose ('forte').
  */
class FuzzyTokensAutocompleteSpec extends AnyFunSuite with BeforeAndAfterAll {
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
      (LayerConfig("poi", idx = 0, zoom = 6, typ = "poi",
        geocoderTokens = Seq(
          "Street" -> TokenSpec("St"),
          "Station" -> TokenSpec("Stn"),
          "Fort" -> TokenSpec("Ft"))),
        docs(
          GeoDoc(1, "30th Street Station", 100, pt(0, 0), 0, 0),
          GeoDoc(2, "Fort Wayne Stadium", 100, pt(0, 0), 0, 0),
          GeoDoc(3, "Ft Sumpter Museum", 100, pt(0, 0), 0, 0),
          GeoDoc(4, "Fortenberry Coffee", 100, pt(0, 0), 0, 0)))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(q: String, autocomplete: Boolean = true,
                 fuzzy: Boolean = true): Seq[(String, Long, Double)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, index, queries,
      Forward.Options(fuzzy = fuzzy, autocomplete = autocomplete))
      .select(col("place_name"), col("feature_id"), col("relev"))
      .as[(String, Long, Double)].collect().toSeq
  }

  test("30th st: matches by autocomplete, relevance 1") {
    val res = fw("30th st")
    assert(res.length === 1, s"got $res")
    assert(res.head._1 === "30th Street Station")
    assert(res.head._2 === 1L)
    assert(res.head._3 === 1.0, s"got $res")
  }

  test("30th stn: matches by stn -> st fuzzy, relevance < 1") {
    val res = fw("30th stn")
    assert(res.length === 1, s"got $res")
    assert(res.head._1 === "30th Street Station", s"got $res")
    assert(res.head._2 === 1L)
    assert(res.head._3 < 1.0, s"got $res")
  }

  test("30th street: matches by autocomplete with replacement, relevance 1") {
    val res = fw("30th street")
    assert(res.length === 1, s"got $res")
    assert(res.head._1 === "30th Street Station")
    assert(res.head._3 === 1.0, s"got $res")
  }

  test("30th station: replaced last word forces exact word-boundary ending -> nothing") {
    val res = fw("30th station")
    assert(res.isEmpty, s"got $res")
  }

  test("30th strete: fuzzy then replacement then autocomplete, relevance < 1") {
    val res = fw("30th strete")
    assert(res.length === 1, s"got $res")
    assert(res.head._1 === "30th Street Station", s"got $res")
    assert(res.head._3 < 1.0, s"got $res")
  }

  test("30th stre: partial-word replacement then autocomplete, relevance 1") {
    val res = fw("30th stre")
    assert(res.length === 1, s"got $res")
    assert(res.head._1 === "30th Street Station", s"got $res")
    assert(res.head._3 === 1.0, s"got $res")
  }

  test("fo: found all ft/fo* things") {
    val res = fw("fo")
    assert(res.map(_._1).sorted ===
      Seq("Fort Wayne Stadium", "Fortenberry Coffee", "Ft Sumpter Museum"),
      s"got $res")
  }

  test("fort: found all ft/fo* things") {
    val res = fw("fort")
    assert(res.map(_._1).sorted ===
      Seq("Fort Wayne Stadium", "Fortenberry Coffee", "Ft Sumpter Museum"),
      s"got $res")
  }

  test("ft: found only ft/fort things") {
    val res = fw("ft")
    assert(res.map(_._1).sorted ===
      Seq("Fort Wayne Stadium", "Ft Sumpter Museum"), s"got $res")
  }

  test("fo/fort without autocomplete: nothing") {
    assert(fw("fo", autocomplete = false).isEmpty)
    assert(fw("fort", autocomplete = false).isEmpty)
  }

  test("forte: fuzzy-prefix reaches everything fort-like") {
    val res = fw("forte")
    assert(res.map(_._1).sorted ===
      Seq("Fort Wayne Stadium", "Fortenberry Coffee", "Ft Sumpter Museum"),
      s"got $res")
  }
}
