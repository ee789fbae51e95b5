package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import com.fasterxml.jackson.databind.ObjectMapper
import graft.index.{IndexBuilder, PageSynth}
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward
import graft.sources.CarmenSource

/** I17 storable-property whitelist + S3 directory loader: an exported
  * source directory reloads and geocodes identically (reference
  * lib/util/feature.js:263-311, lib/sources/loader.js:9-35).
  */
class CarmenSourceSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("storable-property whitelist matches the reference rules") {
    // nulls always drop
    assert(!CarmenSource.storableKeep("anything", isNull = true))
    // non-carmen props keep
    assert(CarmenSource.storableKeep("override:postcode", isNull = false))
    assert(CarmenSource.storableKeep("wikidata", isNull = false))
    // carmen:text* and carmen:format* keep
    assert(CarmenSource.storableKeep("carmen:text", isNull = false))
    assert(CarmenSource.storableKeep("carmen:text_en", isNull = false))
    assert(CarmenSource.storableKeep("carmen:format_de", isNull = false))
    // whitelisted carmen props keep
    for (k <- Seq("carmen:score", "carmen:center", "carmen:types",
      "carmen:geocoder_stack", "carmen:reverse_only"))
      assert(CarmenSource.storableKeep(k, isNull = false), k)
    // feature-only props drop for vector type
    assert(CarmenSource.storableKeep("carmen:addressnumber", isNull = false))
    assert(!CarmenSource.storableKeep("carmen:addressnumber", isNull = false,
      typ = "vector"))
    assert(CarmenSource.storableKeep("carmen:zxy", isNull = false))
    // unknown carmen props drop
    assert(!CarmenSource.storableKeep("carmen:spatialmatch", isNull = false))
    assert(!CarmenSource.storableKeep("carmen:relev", isNull = false))
  }

  test("doc json round-trip preserves every typed field; unknown carmen props drop") {
    val mapper = new ObjectMapper()
    val doc = GeoDoc(42, "Fake Street,Calle Falsa", 7.5,
      """{"type":"GeometryCollection","geometries":[{"type":"MultiPoint","coordinates":[[0.001,0.001],[0.002,0.002]]}]}""",
      0.001, 0.001,
      addressnumber = Seq(Seq("9b", "10c")),
      rangetype = "tiger",
      lfromhn = Seq(Seq(), Seq("2")), ltohn = Seq(Seq(), Seq("98")),
      rfromhn = Seq(Seq(), Seq("1")), rtohn = Seq(Seq(), Seq("99")),
      parityl = Seq(Seq(), Seq("E")), parityr = Seq(Seq(), Seq("O")),
      intersections = Seq(Seq("main st", "9th st")),
      langTexts = Map("es" -> "Calle Falsa", "de" -> "Falschstrasse"),
      overrides = Map("override:postcode" -> "20002"),
      addressprops = Map("override:postcode" -> Map(0 -> "20001", 1 -> "")),
      types = Seq("address"))
    val json = CarmenSource.toCarmenJson(mapper, doc)
    val back = CarmenSource.fromCarmenJson(mapper, json)
    assert(back.copy(geometry = "") === doc.copy(geometry = ""))
    assert(back.geometry.contains("MultiPoint"))
    // unknown carmen:* props injected into the json are stripped on load
    val tampered = json.replace("\"carmen:text\"",
      "\"carmen:spatialmatch\":123,\"carmen:text\"")
    val cleaned = CarmenSource.fromCarmenJson(mapper, tampered)
    assert(cleaned.copy(geometry = "") === doc.copy(geometry = ""))
  }

  test("an exported directory reloads and geocodes identically") {
    val sp = spark; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("carmen_export").toString
    // the acceptance gazetteer + an address layer with overrides
    val base = PageSynth.layerConfigs.map(c =>
      (c, PageSynth.docsByLayer(spark,
        PageSynth.extract(spark, PageSynth.pages(spark, 150)))(c.name)))
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])
    val addr = (LayerConfig("address", idx = 4, zoom = 14, typ = "address",
      geocoderAddress = true),
      docs(GeoDoc(7, "Fake Street", 0,
        """{"type":"GeometryCollection","geometries":[{"type":"MultiPoint","coordinates":[[-74.001,40.901],[-74.002,40.902]]}]}""",
        -74.001, 40.901, addressnumber = Seq(Seq("9b", "10c")))))
    val layers = base :+ addr
    CarmenSource.exportDir(spark, dir, layers)

    val loaded = CarmenSource.autodir(spark, dir)
    assert(loaded.map(_._1.name) === layers.map(_._1.name))
    assert(loaded.map(_._1) === layers.map(_._1))

    val idx1 = IndexBuilder.build(spark, layers)
    val idx2 = IndexBuilder.build(spark, loaded)
    val queries = Seq((1L, "West Lake View Rd Englewood"),
      (2L, "9b fake street"), (3L, "Chester New Jersey")).toDF("query_id", "query")
    def run(idx: IndexBuilder.CarmenIndex) =
      Forward.forward(spark, idx, queries)
        .select(col("query_id"), col("rank"), col("relev"), col("place_name"),
          col("center_lon"), col("center_lat"))
        .collect().map(_.toString).sorted.toSeq
    assert(run(idx2) === run(idx1))
  }
}
