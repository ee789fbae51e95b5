package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward

/** scoredist proximity arbitration, ported from
  * test/acceptance/geocode-unit.scoredist.test.js: a far feature with a
  * dominant score outranks nearby noise ("superscored"), while a closer
  * mid-score feature wins when the proximity point sits next to it; the
  * declared source maxscore (not the observed layer max) scales the score
  * weight.
  */
class ScoredistSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var index1: IndexBuilder.CarmenIndex = _
  private var index2: IndexBuilder.CarmenIndex = _

  private def pt(lon: Double, lat: Double): String =
    s"""{"type":"Point","coordinates":[$lon,$lat]}"""

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    def docs(d: Seq[GeoDoc]) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])
    // block 1: address layer, declared maxscore 100000
    val block1 =
      GeoDoc(200, "main st", 10000, pt(-179.99, 85), -179.99, 85) +:
      GeoDoc(201, "main st", 1000, pt(20, 0), 20, 0) +:
      (1 until 100).map(i => GeoDoc(i, "main st", 50, pt(0, 0), 0, 0))
    index1 = IndexBuilder.build(spark, Seq(
      (LayerConfig("address", idx = 0, zoom = 6, typ = "address",
        maxscore = 100000), docs(block1))))
    // block 2: z14 poi layer, declared maxscore 350
    val block2 =
      GeoDoc(200, "airport", 300,
        pt(-92.098388671875, 85.03118586530456),
        -92.098388671875, 85.03118586530456) +:
      (1 until 100).map(i => GeoDoc(i, "airport", 10,
        pt(-92.098388671875, 85.03308863057421),
        -92.098388671875, 85.03308863057421))
    index2 = IndexBuilder.build(spark, Seq(
      (LayerConfig("poi", idx = 0, zoom = 14, typ = "poi",
        maxscore = 350), docs(block2))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def top(index: IndexBuilder.CarmenIndex, q: String,
                  prox: (Double, Double)): Long = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, index, queries,
      Forward.Options(proximity = Some(prox)))
      .select(col("feature_id")).as[Long].collect().head
  }

  test("proximity [10,10]: the far superscored feature wins") {
    assert(top(index1, "main st", (10, 10)) === 200L)
  }

  test("proximity [20,3]: the nearest mid-score feature wins") {
    assert(top(index1, "main st", (20, 3)) === 201L)
  }

  test("z14 poi: superscored feature beats 99 nearby noise features") {
    assert(top(index2, "airport", (-92.09, 85.05)) === 200L)
  }
}
