package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Forward
import TestGeom._

/** Ported autocomplete-toggle fixtures (reference
  * test/acceptance/geocode-unit.noauto.test.js): an autocomplete prefix
  * match can outscore an exact match, disabling autocomplete flips the
  * winner, and a non-initial token never prefix-matches.
  */
class NoautoSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var abc: IndexBuilder.CarmenIndex = _
  private var tok: IndexBuilder.CarmenIndex = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])

    val t32 = tilePoly(6, (32, 32))
    abc = IndexBuilder.build(spark, Seq(
      (LayerConfig("place", idx = 0, zoom = 6, typ = "place"),
        docs(
          GeoDoc(1, "abcde", 100, t32, 0, 0),
          GeoDoc(2, "abc", 10, t32, 0, 0)))))

    tok = IndexBuilder.build(spark, Seq(
      (LayerConfig("place", idx = 0, zoom = 6, typ = "place"),
        docs(GeoDoc(1, "place one", 100, t32, 0, 0)))))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(idx: IndexBuilder.CarmenIndex, q: String,
                 autocomplete: Boolean): Seq[(String, Long)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, idx, queries,
      Forward.Options(limitVerify = 1, autocomplete = autocomplete,
        fuzzy = false))
      .select(col("place_name"), col("feature_id"))
      .as[(String, Long)].collect().toSeq
  }

  test("abc + autocomplete: higher-scored abcde wins") {
    val res = fw(abc, "abc", autocomplete = true)
    assert(res.head === (("abcde", 1L)), s"got $res")
  }

  test("abc - autocomplete: exact abc wins") {
    val res = fw(abc, "abc", autocomplete = false)
    assert(res.head === (("abc", 2L)), s"got $res")
  }

  test("abcde + autocomplete") {
    val res = fw(abc, "abcde", autocomplete = true)
    assert(res.head === (("abcde", 1L)), s"got $res")
  }

  test("abcde - autocomplete") {
    val res = fw(abc, "abcde", autocomplete = false)
    assert(res.head === (("abcde", 1L)), s"got $res")
  }

  test("ab + autocomplete") {
    val res = fw(abc, "ab", autocomplete = true)
    assert(res.head === (("abcde", 1L)), s"got $res")
  }

  test("ab - autocomplete: nothing") {
    assert(fw(abc, "ab", autocomplete = false).isEmpty)
  }

  test("place + autocomplete: prefix of the full phrase") {
    val res = fw(tok, "place", autocomplete = true)
    assert(res.head === (("place one", 1L)), s"got $res")
  }

  test("place - autocomplete: nothing") {
    assert(fw(tok, "place", autocomplete = false).isEmpty)
  }

  test("one +/- autocomplete: a non-initial token never matches") {
    assert(fw(tok, "one", autocomplete = true).isEmpty)
    assert(fw(tok, "one", autocomplete = false).isEmpty)
  }

  test("place o + autocomplete") {
    val res = fw(tok, "place o", autocomplete = true)
    assert(res.head === (("place one", 1L)), s"got $res")
  }

  test("place o - autocomplete: nothing") {
    assert(fw(tok, "place o", autocomplete = false).isEmpty)
  }
}
