package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward

/** Squishy score inheritance (reference verifymatch.js:813-838, 939-972;
  * test/acceptance/geocode-unit.promote-on-identical-name.test.js behavior):
  * an inherit_score feature with the same name as a context peer inherits
  * its score, promoting it over the coarser duplicate.
  */
class SquishySpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var index: IndexBuilder.CarmenIndex = _

  private val poly =
    """{"type":"Polygon","coordinates":[[[-74.2,40.6],[-74.2,40.9],[-73.7,40.9],[-73.7,40.6],[-74.2,40.6]]]}"""
  private val bigPoly =
    """{"type":"Polygon","coordinates":[[[-125,24],[-125,49],[-66,49],[-66,24],[-125,24]]]}"""

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])
    index = IndexBuilder.build(spark, Seq(
      (LayerConfig("country", idx = 0, zoom = 6, typ = "country"),
        docs(GeoDoc(1, "united states,america,usa", 500, bigPoly, -98, 39))),
      (LayerConfig("region", idx = 1, zoom = 6, typ = "region"),
        docs(GeoDoc(2, "new york,ny", 200, poly, -74.0, 40.75))),
      (LayerConfig("place", idx = 2, zoom = 6, typ = "place",
        geocoderInheritScore = true),
        docs(GeoDoc(3, "new york,nyc", 1, poly, -73.97, 40.78)))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("identical-name place inherits the region score and wins") {
    val sp = spark; import sp.implicits._
    val res = Forward.forward(spark, index,
      Seq((1L, "new york usa")).toDF("query_id", "query"),
      Forward.Options(fuzzy = false, autocomplete = false))
      .select(col("rank"), col("relev"), col("place_name"), col("feature_id"),
        col("lead_idx"))
      .as[(Int, Double, String, Long, Int)].collect().toSeq.sortBy(_._1)
    assert(res.nonEmpty)
    assert(res.head._4 === 3L && res.head._5 === 2,
      s"place.3 promoted over region.2: $res")
    assert(res.head._2 === 1.0, s"got $res")
  }
}
