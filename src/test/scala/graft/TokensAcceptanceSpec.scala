package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.TokenSpec
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward

/** Ported geocoder_tokens acceptance fixtures (reference
  * test/acceptance/geocode-unit.tokens.test.js): simple and complex token
  * replacement through index + query, end to end.
  */
class TokensAcceptanceSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  private val pt = """{"type":"Point","coordinates":[0,0]}"""

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def build(tokens: Seq[(String, TokenSpec)], text: String): IndexBuilder.CarmenIndex = {
    val sp = spark
    val docs = sp.createDataset(Seq(GeoDoc(1, text, 0, pt, 0, 0)))(
      org.apache.spark.sql.Encoders.product[GeoDoc])
    IndexBuilder.build(spark, Seq(
      (LayerConfig("address", idx = 0, zoom = 6, typ = "address",
        geocoderTokens = tokens), docs)))
  }

  private def fw(index: IndexBuilder.CarmenIndex, q: String): Seq[(Double, String)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, index, queries,
      Forward.Options(fuzzy = false, autocomplete = false))
      .select(col("relev"), col("place_name"))
      .as[(Double, String)].collect().toSeq
  }

  test("simple token: 'fake street' found via 'fake st'") {
    val idx = build(Seq("Street" -> TokenSpec("St")), "fake street")
    val res = fw(idx, "fake st")
    assert(res.nonEmpty && res.head._1 === 1.0, s"got $res")
    assert(res.head._2 === "fake street")
    val res2 = fw(idx, "fake street")
    assert(res2.nonEmpty && res2.head._1 === 1.0, s"got $res2")
  }

  test("complex span token: dix-huitième <-> 18e both resolve") {
    val tokens = Seq("dix-huitième" ->
      TokenSpec("18e", plain = false, spanBoundaries = Some(1)))
    val idx = build(tokens, "avenue du 18e régiment")
    val r1 = fw(idx, "avenue du 18e régiment")
    assert(r1.nonEmpty && r1.head._1 === 1.0, s"got $r1")
    val r2 = fw(idx, "avenue du dix-huitième régiment")
    assert(r2.nonEmpty && r2.head._1 === 1.0, s"got $r2")
  }

  test("regex token with captures") {
    val tokens = Seq("q([a-z])([a-z])([a-z])" ->
      TokenSpec("$3$2$1", plain = false, regex = true))
    val idx = build(tokens, "cba")
    val res = fw(idx, "qabc")
    assert(res.nonEmpty && res.head._1 === 1.0, s"got $res")
  }

  test("global strasse pattern normalizes both sides") {
    val idx = {
      val sp = spark
      val docs = sp.createDataset(Seq(GeoDoc(1, "Talstraße", 0, pt, 0, 0)))(
        org.apache.spark.sql.Encoders.product[GeoDoc])
      IndexBuilder.build(spark, Seq(
        (LayerConfig("address", idx = 0, zoom = 6, typ = "address",
          globalTokens = Seq("(?:\\b|^)(.+)(strasse|str|straße)(?:\\b|$)" -> "$1 str")),
          docs)))
    }
    // indexed as 'tal str'; the query side applies no global replacer in the
    // reference either — query with the replaced form
    val res = fw(idx, "tal str")
    assert(res.nonEmpty && res.head._1 === 1.0, s"got $res")
  }
}
