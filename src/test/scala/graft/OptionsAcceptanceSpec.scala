package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.{IndexBuilder, PageSynth}
import graft.query.Forward

/** Forward options surface (F1-F8 subset): types / stacks layer pruning and
  * the tile-space bbox filter (reference lib/geocoder/filter-sources.js,
  * geocode-unit.types.test.js behaviors).
  */
class OptionsAcceptanceSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var index: IndexBuilder.CarmenIndex = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    index = PageSynth.buildIndex(spark, 150)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(q: String, opts: Forward.Options): Seq[(Int, String, Int)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, index, queries, opts)
      .select(col("rank"), col("place_name"), col("lead_idx"))
      .as[(Int, String, Int)].collect().toSeq.sortBy(_._1)
  }

  test("types filter restricts results to the requested layer type") {
    // 'Springfield' matches a place; with types=[region] the place layer is
    // pruned and no result leads with it
    val all = fw("Springfield", Forward.Options(fuzzy = false))
    assert(all.nonEmpty && all.head._3 === 2, s"place lead by default: $all")
    val typed = fw("Springfield", Forward.Options(fuzzy = false,
      types = Seq("region")))
    assert(typed.forall(_._3 === 1), s"only region leads: $typed")
  }

  test("types filter keeps matching layers intact") {
    val typed = fw("Pennsylvania", Forward.Options(fuzzy = false,
      types = Seq("region")))
    assert(typed.nonEmpty && typed.head._2.startsWith("Pennsylvania"), s"got $typed")
  }

  test("bbox filter drops covers outside the window") {
    // Lakewood, TX is around (-98.55, 29.95); a bbox over the northeast
    // excludes it
    val in = fw("Lakewood", Forward.Options(fuzzy = false,
      bbox = Some((-99.5, 29.0, -98.0, 30.5))))
    assert(in.nonEmpty && in.head._2.startsWith("Lakewood"), s"got $in")
    val out = fw("Lakewood", Forward.Options(fuzzy = false,
      bbox = Some((-76.0, 39.0, -73.0, 41.5))))
    assert(out.isEmpty || !out.head._2.startsWith("Lakewood"), s"got $out")
  }

  test("unknown stack is rejected with the reference error (F1)") {
    // no PageSynth layer declares a stack, so any stack option is unknown —
    // the reference's option validation rejects it before filtering
    val err = intercept[IllegalArgumentException] {
      fw("Chester", Forward.Options(fuzzy = false, stacks = Seq("us")))
    }
    assert(err.getMessage.startsWith("Stack \"us\" is not a known stack"),
      err.getMessage)
  }

  test("F1 option validation carries the reference error messages") {
    def msg(opts: Forward.Options): String =
      Forward.validateOptions(index, opts).getOrElse("")
    assert(msg(Forward.Options(types = Seq("nope"))).startsWith(
      """Type "nope" is not a known type. Must be one of: """))
    assert(msg(Forward.Options(proximity = Some((181.0, 0.0)))) ===
      "Proximity lon value must be a number between -180 and 180")
    assert(msg(Forward.Options(proximity = Some((0.0, 91.0)))) ===
      "Proximity lat value must be a number between -90 and 90")
    assert(msg(Forward.Options(language = Some("zzzz"))) ===
      "'zzzz' is not a valid language code")
    assert(msg(Forward.Options(languageMode = "loose")) ===
      "'loose' is not a valid language mode")
    assert(msg(Forward.Options(bbox = Some((10.0, 0.0, -10.0, 5.0)))) ===
      "BBox minX value cannot be greater than maxX value")
    assert(msg(Forward.Options(bbox = Some((0.0, 5.0, 10.0, 0.0)))) ===
      "BBox minY value cannot be greater than maxY value")
    assert(msg(Forward.Options(bbox = Some((-200.0, 0.0, 10.0, 5.0)))) ===
      "BBox minX value must be a number between -180 and 180")
    assert(msg(Forward.Options()) === "")
  }
}
