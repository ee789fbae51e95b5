package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward

/** Ported autocomplete word-boundary fixtures (reference
  * test/acceptance/geocode-unit.autocomplete-tokenized-final-term.test.js):
  * a token-replaced or boundary-terminated final term only prefix-matches
  * at whole-word boundaries (wordBoundaryPrefix ending type).
  */
class AutocompleteBoundarySpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var index: IndexBuilder.CarmenIndex = _

  private def mp(lon: Double, lat: Double): String =
    s"""{"type":"MultiPoint","coordinates":[[$lon,$lat]]}"""

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
        geocoderTokens = Seq("District" -> graft.core.TokenSpec("Dt"))),
        docs(
          GeoDoc(1, "DTOWN PARTY BUS", 0, mp(0, 0), 0, 0),
          GeoDoc(2, "District", 0, mp(1, 0), 1, 0),
          GeoDoc(3, "District Taco", 0, mp(0, 1), 0, 1)))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(q: String): Seq[Long] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, index, queries, Forward.Options(autocomplete = true))
      .orderBy(col("rank")).select(col("feature_id")).as[Long].collect().toSeq
  }

  test("token-replaced final term only matches whole-word extensions") {
    val res = fw("District")
    assert(res.toSet === Set(2L, 3L), s"no dtown: $res")
    assert(res.head === 2L, s"exact match first: $res")
  }

  test("bare prefix matches partial words too") {
    assert(fw("dt").toSet === Set(1L, 2L, 3L))
  }

  test("terminal space restricts to whole-word matches") {
    val res = fw("dt ")
    assert(res.toSet === Set(2L, 3L), s"got $res")
  }

  test("other terminal boundaries behave like whitespace") {
    assert(fw("dt/").toSet === fw("dt ").toSet)
  }
}
