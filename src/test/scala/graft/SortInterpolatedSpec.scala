package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.TokenSpec
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward

/** Non-interpolated results outrank interpolated ones at the same
  * relevance, and the default dedupe keeps only the real address point,
  * ported from test/acceptance/geocode-unit.address-sort-interpolated
  * .test.js ('Main St' cluster interpolates 150; 'Main Street' carries the
  * real 150 point).
  */
class SortInterpolatedSpec extends AnyFunSuite with BeforeAndAfterAll {
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
    def gc(points: String) =
      s"""{"type":"GeometryCollection","geometries":[
         |{"type":"MultiLineString","coordinates":[[[-97.2,37.2],[-97.2,37.4]]]},
         |{"type":"MultiPoint","coordinates":[$points]}]}""".stripMargin.replace("\n", "")
    index = IndexBuilder.build(spark, Seq(
      (LayerConfig("address", idx = 0, zoom = 6, typ = "address",
        geocoderAddress = true,
        geocoderTokens = Seq("Street" -> TokenSpec("St"))),
        docs(
          GeoDoc(1, "Main St", 0, gc("[-97.2,37.2],[-97.2,37.4]"),
            -97.2, 37.3,
            rangetype = "tiger",
            lfromhn = Seq(Seq("100"), Nil), ltohn = Seq(Seq("200"), Nil),
            rfromhn = Seq(Seq("101"), Nil), rtohn = Seq(Seq("199"), Nil),
            parityl = Seq(Seq("E"), Nil), parityr = Seq(Seq("O"), Nil),
            addressnumber = Seq(null, Seq("100", "200"))),
          GeoDoc(2, "Main Street", 0, gc("[-97.2,37.3]"),
            -97.2, 37.3,
            rangetype = "tiger",
            lfromhn = Seq(Seq("100"), Nil), ltohn = Seq(Seq("200"), Nil),
            rfromhn = Seq(Seq("101"), Nil), rtohn = Seq(Seq("199"), Nil),
            parityl = Seq(Seq("E"), Nil), parityr = Seq(Seq("O"), Nil),
            addressnumber = Seq(null, Seq("150")))))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(allowDupes: Boolean): Seq[Long] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, "150 Main St")).toDF("query_id", "query")
    Forward.forward(spark, index, queries,
      Forward.Options(limitVerify = 2, allowDupes = allowDupes))
      .select(col("feature_id")).as[Long].collect().toSeq
  }

  test("non-interpolated address returns before interpolated (allow_dupes)") {
    assert(fw(allowDupes = true) === Seq(2L, 1L))
  }

  test("default dedupe keeps only the real address point") {
    assert(fw(allowDupes = false) === Seq(2L))
  }
}
