package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.TokenSpec
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.{FormatPlace, Forward}

/** geocoder_format template helpers (reference lib/util/helpers.js:1-12 and
  * the handlebars-helpers comparison group): block comparison helpers,
  * user-supplied inline helpers (opts.formatHelpers) and moveNumberToEnd.
  * Geocode fixtures ported from test/unit/geocoder/templating.test.js
  * (first block: built-in equality test + user-defined helper functions).
  */
class TemplatingAcceptanceSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var index: IndexBuilder.CarmenIndex = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])
    index = IndexBuilder.build(spark, Seq(
      (LayerConfig("address", idx = 0, zoom = 6, typ = "address",
        geocoderAddress = true,
        geocoderTokens = Seq("Lane" -> TokenSpec("La")),
        geocoderFormat = "{{#eq address.number \"3000\"}}3000!{{else}}" +
          "{{hyphenated address.number}}{{/eq}} {{toUpper address.name}}, " +
          "{{place.name}}, {{region.name}} {{postcode.name}}"),
        docs(GeoDoc(1, "Quincy Lane", 0,
          """{"type":"GeometryCollection","geometries":[{"type":"MultiPoint","coordinates":[[0,0],[1,1]]}]}""",
          0, 0, addressnumber = Seq(Seq("2169", "3000")))))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val formatHelpers: Map[String, String => String] = Map(
    "toUpper" -> ((s: String) => s.toUpperCase),
    "hyphenated" -> ((num: String) =>
      if (num.length == 5) num
      else if (num.length == 4) num.substring(0, 2) + "-" + num.substring(2)
      else if (num.length == 6) num.substring(0, 3) + "-" + num.substring(3)
      else num))

  private def fw(q: String): Seq[String] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, index, queries,
      Forward.Options(formatHelpers = formatHelpers))
      .select(col("place_name")).as[String].collect().toSeq
  }

  test("built-in template helper functions: {{#eq}} block with else") {
    val res = fw("3000 Quincy Lane")
    assert(res.headOption === Some("3000! QUINCY LANE"), s"got $res")
  }

  test("user-defined template helper functions: toUpper + hyphenated") {
    val res = fw("2169 Quincy Lane")
    assert(res.headOption === Some("21-69 QUINCY LANE"), s"got $res")
  }

  // --- FormatPlace unit semantics ---

  test("moveNumberToEnd (reference test/unit/util/helpers.js goldens)") {
    assert(FormatPlace.moveNumberToEnd("1 main st") === "main st 1")
    assert(FormatPlace.moveNumberToEnd("main st") === "main st")
    assert(FormatPlace.moveNumberToEnd("1 17th st") === "1 17th st")
    assert(FormatPlace.moveNumberToEnd(null) === null)
  }

  test("moveNumberToEnd is available as a built-in inline helper") {
    val ctx = Vector(FormatPlace.CtxFeat("address", "1 main st", ""))
    assert(FormatPlace.placeName(ctx, "{{moveNumberToEnd address.name}}")
      === "main st 1")
  }

  test("comparison block helpers: ne/gt/lt/and/or/contains") {
    val ctx = Vector(FormatPlace.CtxFeat("address", "Main St", "42"))
    def t(tpl: String): String = FormatPlace.placeName(ctx, tpl)
    assert(t("{{#ne address.number \"3000\"}}A{{else}}B{{/ne}}") === "A")
    assert(t("{{#gt address.number \"7\"}}A{{else}}B{{/gt}}") === "A")
    assert(t("{{#lt address.number \"7\"}}A{{else}}B{{/lt}}") === "B")
    assert(t("{{#and address.number address.name}}A{{else}}B{{/and}}") === "A")
    assert(t("{{#or place.name address.name}}A{{else}}B{{/or}}") === "A")
    assert(t("{{#contains address.name \"Main\"}}A{{else}}B{{/contains}}")
      === "A")
    // missing operand: eq is false, ne is true
    assert(t("{{#eq place.name \"x\"}}A{{else}}B{{/eq}}") === "B")
  }

  test("comments and nested blocks render") {
    val ctx = Vector(FormatPlace.CtxFeat("address", "Main St", "42"))
    assert(FormatPlace.placeName(ctx,
      "{{!-- comment --}} {{address.name}}") === "Main St")
    assert(FormatPlace.placeName(ctx,
      "{{#eq address.number \"42\"}}{{#eq address.name \"Main St\"}}X" +
        "{{else}}Y{{/eq}}{{else}}Z{{/eq}}") === "X")
  }

  test("properties paths and worldview resolve") {
    val ctx = Vector(FormatPlace.CtxFeat("poi", "Shake Shack", "",
      props = Map("address" -> "C. C Mar Shopping")))
    assert(FormatPlace.placeName(ctx,
      "{{poi.name}}, {{poi.properties.address}}") ===
      "Shake Shack, C. C Mar Shopping")
    assert(FormatPlace.placeName(ctx, "{{poi.name}} ({{worldview}})",
      worldview = "us") === "Shake Shack (us)")
  }
}
