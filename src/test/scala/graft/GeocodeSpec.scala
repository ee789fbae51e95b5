package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.{IndexBuilder, PageSynth}
import graft.query.{Forward, Reverse}

/** End-to-end geocode tests over the synthetic page corpus, mirroring the
  * reference's worked example (reference docs/how-carmen-works.md:92-199)
  * and acceptance-test behaviors (stacking, autocomplete, reverse context).
  */
class GeocodeSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var index: IndexBuilder.CarmenIndex = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    index = PageSynth.buildIndex(spark, 60)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fw(q: String, autocomplete: Boolean = true): Seq[(Int, Double, String)] = {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, q)).toDF("query_id", "query")
    Forward.forward(spark, index, queries,
        Forward.Options(autocomplete = autocomplete))
      .select(col("rank"), col("relev"), col("place_name"))
      .as[(Int, Double, String)].collect().toSeq.sortBy(_._1)
  }

  test("byte-identical extracted text per url (the per-row invariant)") {
    val pages = PageSynth.pages(spark, 100).cache()
    val extracted = PageSynth.extract(spark, pages)
    val joined = pages.select(col("url"), col("text").as("orig"))
      .join(extracted.select(col("url"), col("text").as("ext")), "url")
    assert(joined.count() === 100)
    assert(joined.where(col("orig") =!= col("ext")).count() === 0)
  }

  test("index build produces expected tables") {
    val street = index.layer("street")
    assert(street.postings.count() > 0)
    assert(street.tileFeatures.where(col("z") === 14).count() > 0)
    // phrase ids dense + lexicographic
    val phrases = street.postings.select("phrase", "phrase_id").distinct()
      .orderBy("phrase_id").collect()
    val sortedPhrases = phrases.map(_.getString(0))
    assert(sortedPhrases.sameElements(sortedPhrases.sorted))
  }

  test("forward geocode: full stack (worked example)") {
    val res = fw("West Lake View Rd Englewood")
    assert(res.nonEmpty)
    val top = res.head
    assert(top._3 === "West Lake View Rd, Englewood, New Jersey, United States",
      s"got $res")
    assert(top._2 === 1.0, s"relevance: $res")
  }

  test("forward geocode: place + region") {
    val res = fw("Chester New Jersey")
    assert(res.nonEmpty)
    assert(res.head._3.startsWith("Chester, New Jersey"), s"got $res")
    assert(res.head._2 === 1.0)
  }

  test("forward geocode: single term lands place above street context") {
    val res = fw("Englewood")
    assert(res.nonEmpty)
    assert(res.head._3.startsWith("Englewood"), s"got $res")
  }

  test("forward geocode: autocomplete prefix") {
    val res = fw("Engle")
    assert(res.nonEmpty, "prefix should match englewood")
    assert(res.head._3.toLowerCase.contains("englewood"), s"got $res")
    val noAuto = fw("Engle", autocomplete = false)
    assert(noAuto.isEmpty, s"exact-only should not match: $noAuto")
  }

  test("forward geocode: wrong-region stack does not reach relevance 1") {
    // Englewood St is in Pennsylvania (Springfield); querying it with Texas
    // must not produce a full-relevance stack
    val res = fw("Englewood St Texas")
    res.headOption.foreach { top => assert(top._2 < 1.0, s"got $res") }
  }

  test("reverse geocode: point in Englewood hits full hierarchy") {
    val sp = spark; import sp.implicits._
    val pts = Seq((1L, -74.0, 40.9), (2L, -98.55, 29.95)).toDF("query_id", "lon", "lat")
    val res = Reverse.reverse(spark, index, pts)
      .where(col("rank") === 1)
      .select(col("query_id"), col("place_name")).as[(Long, String)]
      .collect().toMap
    assert(res(1L).contains("Englewood"))
    assert(res(1L).contains("New Jersey"))
    assert(res(1L).contains("United States"))
    assert(res(2L).contains("Lakewood"))
    assert(res(2L).contains("Texas"))
  }

  test("O3 stats + phrasematch debug surfaces") {
    val sp = spark; import sp.implicits._
    val queries = Seq((1L, "West Lake View Rd Englewood")).toDF("query_id", "query")
    val st = new Forward.GeocodeStats()
    val res = Forward.forward(spark, index, queries, stats = Some(st))
    assert(res.count() > 0)
    for (stage <- Seq("phrasematch", "spatialmatch", "verifymatch", "context_rank"))
      assert(st.stageSeconds.contains(stage), s"missing stage $stage: $st")
    assert(st.counts("spatialmatch") > 0 && st.counts("results") > 0, s"$st")
    val dbg = Forward.phrasematchDebug(spark, index, queries)
      .select(col("layer"), col("subquery"), col("weight"))
      .as[(String, String, Double)].collect()
    assert(dbg.exists(r => r._1 == "street" && r._2 == "west lake view rd"), s"got ${dbg.toSeq}")
    assert(dbg.exists(r => r._1 == "place" && r._2 == "englewood"), s"got ${dbg.toSeq}")
    assert(dbg.forall(r => r._3 > 0 && r._3 <= 1.0))
  }

  test("batch forward geocode: many queries at once") {
    val sp = spark; import sp.implicits._
    val queries = (0 until 50).map(i => (i.toLong,
      Seq("Englewood", "Chester New Jersey", "Main St Chester",
        "Springfield Pennsylvania", "Fulton St Lakewood Texas")(i % 5)))
      .toDF("query_id", "query")
    val res = Forward.forward(spark, index, queries)
    val byQuery = res.groupBy("query_id").count().count()
    assert(byQuery === 50, "every query gets results")
  }

  test("fuzzy geocode: one-letter typo still resolves (DL<=1)") {
    val res = fw("West Lake Viev Rd Englewood")
    assert(res.nonEmpty, "typo should fuzzy-match")
    assert(res.head._3 === "West Lake View Rd, Englewood, New Jersey, United States", s"got $res")
    assert(res.head._2 < 1.0 && res.head._2 >= 0.8, s"penalized relevance: $res")
  }

  test("fuzzy geocode: transposition resolves") {
    val res = fw("Chester New Jersye")
    assert(res.nonEmpty)
    assert(res.head._3.startsWith("Chester, New Jersey"), s"got $res")
  }

  test("fuzzy geocode: short words are never corrected (MIN_CORRECTION_LENGTH)") {
    val res = fw("Xain St Chester", autocomplete = false)
    // "xain" -> "main" is a correction of a 4-char word: allowed
    assert(res.exists(_._3.contains("Main St")), s"got $res")
    val res2 = fw("Mxin Qt Chester", autocomplete = false)
    // "qt" -> "st" is 2 chars (< 4): never corrected
    assert(!res2.exists(_._3.contains("Main St")), s"got $res2")
  }
}
