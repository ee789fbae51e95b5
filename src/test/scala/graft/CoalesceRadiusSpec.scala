package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward

/** Per-source geocoder_coalesce_radius (reference index.js:233,381 -> the
  * carmen-core gridstore's coalesce_radius): overrides the zoom-scaled
  * proximity radius in coalesce's scoredist decay, so a source can tune how
  * fast distance discounts score. A tight custom radius flips a
  * far-but-high-score winner to the nearby feature.
  */
class CoalesceRadiusSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  private def pt(lon: Double, lat: Double): String =
    s"""{"type":"Point","coordinates":[$lon,$lat]}"""

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // two same-named places at zoom 12 (distinct tiles): id 1 ~4 miles from
  // the proximity point (score 1), id 2 ~100 miles east (score 3, the max
  // -> 500 score weight). Default z12 radius (600 mi) decays the far
  // feature's scoredist only mildly (score dominates); a 20-mile
  // geocoder_coalesce_radius floors it and the nearby feature wins.
  private def buildIndex(radius: Double): IndexBuilder.CarmenIndex = {
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])
    IndexBuilder.build(spark, Seq(
      (LayerConfig("place", idx = 0, zoom = 12, typ = "place",
        coalesceRadius = radius),
        docs(
          GeoDoc(1, "Quartzfield", 1, pt(0.015, 0.01), 0.015, 0.01),
          GeoDoc(2, "Quartzfield", 3, pt(1.45, 0.01), 1.45, 0.01)))))
  }

  private def top(index: IndexBuilder.CarmenIndex): Long = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, "Quartzfield")).toDF("query_id", "query")
    Forward.forward(spark, index, queries,
      Forward.Options(proximity = Some((0.0, 0.0)),
        spatialmatchStackLimit = 1, limitVerify = 1))
      .select(col("feature_id")).as[Long].collect().head
  }

  test("default zoom-scaled radius: the far high-score feature wins") {
    assert(top(buildIndex(0.0)) === 2L)
  }

  test("tight geocoder_coalesce_radius: the nearby feature wins") {
    assert(top(buildIndex(20.0)) === 1L)
  }
}
