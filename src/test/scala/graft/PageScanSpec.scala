package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.index.PageSynth

/** Edge cases of the ingest JSON scanner (PageSynth.parseGeoPayload):
  * standard-JSON inputs the synthetic corpus never produces — escapes,
  * \\uXXXX, raw multi-byte UTF-8, permuted field order, nested skipped
  * values, scientific notation, malformed payloads. The scanner replaced
  * Jackson in the ingest hot loop for allocation reasons; these tests pin
  * that it still accepts ALL of standard JSON, not just the synth shape.
  */
class PageScanSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("pagescan-test").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def page(json: String): Array[Byte] =
    (s"""<html><body><script type="application/geo+json">$json</script></body></html>""")
      .getBytes("UTF-8")

  private def extractOne(json: String): Option[(String, Long, String, Double, String, Double, Double)] = {
    val sp = spark; import sp.implicits._
    val df = Seq(("u1", page(json), "t1")).toDF("url", "html", "text")
    val rows = PageSynth.extract(spark, df)
      .select("layer", "id", "name", "score", "geometry", "lon", "lat")
      .as[(String, Long, String, Double, String, Double, Double)]
      .collect()
    rows.headOption
  }

  test("permuted field order, whitespace, skipped extra fields") {
    val r = extractOne(
      """ { "score" : 7.5 , "geometry" : {"type":"Point","coordinates":[1,2]} ,
        | "extra": [1, {"a": "}"}, "]"], "name": "Main St", "lat": -4.25,
        | "id": 42, "lon": 3.5, "layer": "street", "flag": true } """.stripMargin)
    assert(r.isDefined)
    val (layer, id, name, score, geom, lon, lat) = r.get
    assert(layer === "street"); assert(id === 42L); assert(name === "Main St")
    assert(score === 7.5); assert(lon === 3.5); assert(lat === -4.25)
    assert(geom.contains("\"coordinates\":[1,2]"))
  }

  test("escaped quotes, backslashes, \\uXXXX, and control escapes in name") {
    val r = extractOne(
      """{"layer":"place","id":1,"name":"Café \"Le\\Bon\"\n","score":1,""" +
        """"lon":0,"lat":0,"geometry":{"type":"Point","coordinates":[0,0]}}""")
    assert(r.isDefined)
    assert(r.get._3 === "Café \"Le\\Bon\"\n")
  }

  test("raw multi-byte UTF-8 mixed with escapes in one string") {
    // é as raw UTF-8 bytes, followed by an escaped quote — the escape after
    // the multi-byte sequence must still be decoded
    val r = extractOne(
      """{"layer":"place","id":2,"name":"Caf""" + "é" + """ \"X\"","score":1,""" +
        """"lon":0,"lat":0,"geometry":{"type":"Point","coordinates":[0,0]}}""")
    assert(r.isDefined)
    assert(r.get._3 === "Café \"X\"")
  }

  test("scientific notation and signed numbers") {
    val r = extractOne(
      """{"layer":"place","id":3,"name":"N","score":1.5e2,""" +
        """"lon":-1.25E-1,"lat":+0.5,"geometry":{"type":"Point","coordinates":[0,0]}}""")
    assert(r.isDefined)
    assert(r.get._4 === 150.0)
    assert(r.get._6 === -0.125)
    assert(r.get._7 === 0.5)
  }

  test("geometry raw span survives nested structures verbatim") {
    val geom = """{"type":"Polygon","coordinates":[[[0,0],[1,0],[1,1],[0,0]]],"extra":{"a":[{"b":"]}"}]}}"""
    val r = extractOne(
      s"""{"layer":"place","id":4,"name":"P","score":1,"lon":0,"lat":0,"geometry":$geom}""")
    assert(r.isDefined)
    assert(r.get._5 === geom)
  }

  test("malformed payloads are dropped, not crashed") {
    for (bad <- Seq(
      """{"layer":"place","id":5""",                       // truncated
      """{"layer":"place","id":5,"name":"X""",             // unterminated string
      """["layer","place"]""",                             // not an object
      """{"layer":"place","id":6,"score":1,"lon":0,"lat":0}""" // missing name+geometry
    )) assert(extractOne(bad).isEmpty, s"should drop: $bad")
  }

  test("missing fields do not inherit values from the previous row in a partition") {
    val sp = spark; import sp.implicits._
    val good =
      """{"layer":"place","id":7,"name":"Good","score":9,"lon":1,"lat":2,""" +
        """"geometry":{"type":"Point","coordinates":[1,2]}}"""
    val missingName =
      """{"layer":"place","id":8,"score":9,"lon":1,"lat":2,""" +
        """"geometry":{"type":"Point","coordinates":[1,2]}}"""
    val df = Seq(("u1", page(good), "t"), ("u2", page(missingName), "t"))
      .toDF("url", "html", "text").coalesce(1)
    val rows = PageSynth.extract(spark, df).select("url", "name")
      .as[(String, String)].collect().toMap
    assert(rows === Map("u1" -> "Good"))
  }
}
