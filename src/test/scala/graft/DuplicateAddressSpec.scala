package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.TokenSpec
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward
import TestGeom._

/** Ported duplicate-address fixtures (reference
  * test/acceptance/geocode-unit.duplicate-address.test.js): allow_dupes
  * exposes same-name results that the default dedupe collapses; the
  * address-unique key also collapses street fallbacks whose matched cover
  * text is identical ("Main st" vs "Main street" with Street->st); the
  * dedupe prefers non-omitted features over omitted degens.
  *
  * Not ported: the reference clones a feature per duplicate cluster entry
  * ("100" listed twice in one carmen:addressnumber -> two results under
  * allow_dupes); this engine resolves one point per feature.
  */
class DuplicateAddressSpec extends AnyFunSuite with BeforeAndAfterAll {
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
        geocoderAddress = true, geocoderName = "address",
        geocoderTokens = Seq("Street" -> TokenSpec("st"))),
        docs(
          GeoDoc(100, "103 Main st", 0, pt(4, 4), 4, 4, omitted = true),
          GeoDoc(101, "Main st", 0,
            mpt((0, 0), (1, 1), (2, 2), (3, 3), (4, 4)), 0, 0,
            addressnumber = Seq(Seq("100", "101", "102", "103", "100"))),
          GeoDoc(102, "Main street", 0, mpt((4, 4)), 0, 0,
            addressnumber = Seq(Seq("102"))),
          GeoDoc(103, "103 Main st", 0, pt(4, 4), 4, 4, omitted = true)))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(q: String, allowDupes: Boolean): Seq[(String, Long)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, index, queries,
      Forward.Options(allowDupes = allowDupes))
      .select(col("place_name"), col("feature_id"))
      .as[(String, Long)].collect().toSeq
  }

  test("Main st - allow dupes: both streets surface") {
    val res = fw("Main st", allowDupes = true)
    assert(res.map(_._1) === Seq("Main st", "Main street"), s"got $res")
  }

  test("Main st - no dupes: identical cover text collapses the fallbacks") {
    val res = fw("Main st", allowDupes = false)
    assert(res.map(_._1) === Seq("Main st"), s"got $res")
  }

  test("101 Main st - allow dupes") {
    val res = fw("101 Main st", allowDupes = true)
    assert(res.map(_._1) === Seq("101 Main st", "Main street"), s"got $res")
  }

  test("101 Main st - no dupes") {
    val res = fw("101 Main st", allowDupes = false)
    assert(res.map(_._1) === Seq("101 Main st"), s"got $res")
  }

  test("100 Main st - no dupes") {
    val res = fw("100 Main st", allowDupes = false)
    assert(res.map(_._1) === Seq("100 Main st"), s"got $res")
  }

  test("102 Main st - allow dupes: both clusters resolve 102") {
    val res = fw("102 Main st", allowDupes = true)
    assert(res.map(_._1) === Seq("102 Main st", "102 Main street"), s"got $res")
  }

  test("102 Main st - no dupes") {
    val res = fw("102 Main st", allowDupes = false)
    assert(res.map(_._1) === Seq("102 Main st"), s"got $res")
  }

  test("103 Main street - allow dupes: degens and the cluster all surface") {
    val res = fw("103 Main street", allowDupes = true)
    assert(res.count(_._1 == "103 Main st") >= 3, s"got $res")
    assert(res.map(_._1).contains("Main street"), s"got $res")
  }

  test("103 Main street - no dupes: prefer the non-omitted cluster") {
    val res = fw("103 Main street", allowDupes = false)
    assert(res.map(_._1) === Seq("103 Main st"), s"got $res")
    assert(res.head._2 === 101L, "Prefer non-omitted: " + res)
  }
}
