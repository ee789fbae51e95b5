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

  test("stacks filter prunes layers whose stack does not intersect") {
    // PageSynth layers carry no stack config -> stacks never prune them
    val res = fw("Chester", Forward.Options(fuzzy = false,
      stacks = Seq("us")))
    assert(res.nonEmpty, s"stackless layers always allowed: $res")
  }
}
