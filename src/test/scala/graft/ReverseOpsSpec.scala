package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.{IndexBuilder, PageSynth}
import graft.model.{GeoDoc, LayerConfig}
import graft.query.Reverse

/** Reverse completeness: kNN (R9), score mode + score filter (R5),
  * stackFeatures replacement rules (R8), id geocode (R2), asReverse (R1).
  */
class ReverseOpsSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  test("asReverse parses lon,lat queries only") {
    assert(Reverse.asReverse("-74.0, 40.9") === Some((-74.0, 40.9)))
    assert(Reverse.asReverse("0,0") === Some((0.0, 0.0)))
    assert(Reverse.asReverse("foo,bar").isEmpty)
    assert(Reverse.asReverse("1,2,3").isEmpty)
    assert(Reverse.asReverse("main street").isEmpty)
  }

  test("idGeocode resolves layer.id references") {
    val sp = spark; import sp.implicits._
    val qs = Seq((1L, "place.101"), (2L, "street.1001"), (3L, "place.99999"))
      .toDF("query_id", "query")
    val res = Reverse.idGeocode(spark, index, qs)
      .select(col("query_id"), col("place_name"))
      .as[(Long, String)].collect().toMap
    assert(res(1L) === "Chester")
    assert(res(2L) === "West Lake View Rd")
    assert(!res.contains(3L))
  }

  test("nearestK returns k nearest streets by distance") {
    val sp = spark; import sp.implicits._
    val pts = Seq((1L, -74.0, 40.9)).toDF("query_id", "lon", "lat")
    val res = Reverse.nearestK(spark, index, pts, "street", limit = 3)
      .select(col("rank"), col("feature_id"), col("dist_miles"))
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(res.nonEmpty)
    // nearest street to (-74.0, 40.9) is West Lake View Rd (1001)
    assert(res.head._2 === 1001L, s"got ${res.toSeq}")
    // distances nondecreasing with rank
    assert(res.sliding(2).forall(p => p.length < 2 || p(0)._3 <= p(1)._3))
  }

  test("reverseWithOptions types filter restricts the lead layer") {
    val sp = spark; import sp.implicits._
    val pts = Seq((1L, -74.0, 40.9)).toDF("query_id", "lon", "lat")
    val res = Reverse.reverseWithOptions(spark, index, pts,
      Reverse.ReverseOptions(types = Seq("place")))
      .select(col("layer"), col("place_name"))
      .as[(String, String)].collect()
    assert(res.nonEmpty)
    assert(res.head._1 === "place", s"got ${res.toSeq}")
    assert(res.head._2.startsWith("Englewood"), s"got ${res.toSeq}")
  }

  test("score mode prefers high-distscore features; scoreFilter windows them") {
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])
    def p(lon: Double, lat: Double) = s"""{"type":"Point","coordinates":[$lon,$lat]}"""
    // same tile: a close low-score POI and a slightly farther high-score POI
    val idx2 = IndexBuilder.build(spark, Seq(
      (LayerConfig("poi", idx = 0, zoom = 6, typ = "poi"),
        docs(GeoDoc(1, "corner shop", 1, p(0.01, 0.01), 0.01, 0.01),
          GeoDoc(2, "grand station", 500, p(0.3, 0.3), 0.3, 0.3)))))
    import sp.implicits._
    val pts = Seq((1L, 0.02, 0.02)).toDF("query_id", "lon", "lat")
    val byDist = Reverse.reverseWithOptions(spark, idx2, pts,
      Reverse.ReverseOptions(radiusMiles = 100))
      .select(col("feature_id")).as[Long].collect()
    val byScore = Reverse.reverseWithOptions(spark, idx2, pts,
      Reverse.ReverseOptions(reverseMode = "score", radiusMiles = 100))
      .select(col("feature_id")).as[Long].collect()
    assert(byDist.head === 1L, s"distance mode picks the closer: ${byDist.toSeq}")
    assert(byScore.head === 2L, s"score mode picks the higher distscore: ${byScore.toSeq}")
    val filtered = Reverse.nearestK(spark, idx2, pts, "poi", limit = 5,
      Reverse.ReverseOptions(scoreFilter = Some((100.0, 1000.0)), radiusMiles = 100))
      .select(col("feature_id")).as[Long].collect()
    assert(filtered.toSeq === Seq(2L), s"score filter keeps only 500: ${filtered.toSeq}")
  }

  test("reverse snaps address leads to the nearest cluster point (R7)") {
    val sp = spark
    def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])
    val idx2 = IndexBuilder.build(spark, Seq(
      (LayerConfig("address", idx = 0, zoom = 6, typ = "address",
        geocoderAddress = true),
        docs(GeoDoc(1, "fake street", 0,
          """{"type":"GeometryCollection","geometries":[{"type":"MultiPoint","coordinates":[[0.001,0.001],[0.002,0.002],[0.003,0.003]]}]}""",
          0.001, 0.001, addressnumber = Seq(Seq("9b", "10c", "7")))))))
    import sp.implicits._
    val pts = Seq((1L, 0.0021, 0.0021)).toDF("query_id", "lon", "lat")
    val res = Reverse.reverse(spark, idx2, pts)
      .select(col("place_name"), col("center_lon"), col("center_lat"))
      .as[(String, Double, Double)].collect()
    assert(res.nonEmpty)
    assert(res.head._1 === "10c fake street", s"got ${res.toSeq}")
    assert(res.head._2 === 0.002 && res.head._3 === 0.002, s"got ${res.toSeq}")
  }

  private def cand(idx: Int, layer: String, typs: Seq[String], fid: Long,
                   text: String, dist: Double, geomType: String,
                   conflict: String = "", score: Double = 0.0,
                   matched: Boolean = false): Reverse.CandRow =
    Reverse.CandRow(1L, 0, idx, layer, typs, conflict, fid,
      idx.toLong * (1L << 25) + fid % (1L << 24), text, dist, score,
      geomType, 0, 0, Map.empty, matched, 1)

  private def stackNames(picks: Vector[Reverse.CandRow],
                         opts: Reverse.StackOpts = Reverse.StackOpts()): String =
    Reverse.stackMemo(picks, opts)
      .map(_.cand.text.split(",")(0)).mkString(", ")

  test("stackMemo replacement: closer non-polygon replaces same type; polygon blocks") {
    val rows = Vector(
      cand(2, "placeA", Seq("place"), 10, "near town", 0.5, "Point"),
      cand(1, "placeB", Seq("place"), 11, "far town", 2.0, "Point"),
      cand(0, "region", Seq("region"), 12, "state", 0.0, "Polygon"))
    // placeB (coarser) is farther -> cannot replace placeA
    assert(stackNames(rows) === "near town, state")
    // now the coarser same-type feature is closer -> replaces
    val rows2 = rows.updated(1, rows(1).copy(dist_miles = 0.1))
    assert(stackNames(rows2) === "far town, state")
    // a Polygon claimant is never replaced
    val rows3 = Vector(
      cand(1, "placeA", Seq("place"), 10, "poly town", 1.0, "Polygon"),
      cand(0, "placeB", Seq("place"), 11, "pt town", 0.0, "Polygon"))
    assert(stackNames(rows3) === "poly town")
  }

  test("stackMemo multitype shift + conflict keys (R8)") {
    // caracas is a region source feature with carmen:types [region, place]:
    // claims "place" when free, shifts to "region" when place is claimed
    // (reference geocode-unit.multitype.test.js)
    val caracas = cand(0, "region", Seq("region", "place"), 1, "caracas",
      0.0, "Polygon")
    val libertador = cand(1, "place", Seq("place"), 1, "libertador",
      0.0, "Polygon")
    val cafe = cand(2, "poi", Seq("poi"), 1, "cafe", 0.0, "Point")
    val full = Reverse.stackMemo(Vector(cafe, libertador, caracas),
      Reverse.StackOpts())
    assert(full.map(_.cand.text) === Vector("cafe", "libertador", "caracas"))
    assert(full.map(_.claimedType) === Vector("poi", "place", "region"))
    // alone, the multitype feature claims its LAST type
    val solo = Reverse.stackMemo(Vector(caracas), Reverse.StackOpts())
    assert(solo.map(_.claimedType) === Vector("place"))
    // maxtype=place forces the shift to region
    val shifted = Reverse.stackMemo(Vector(caracas),
      Reverse.StackOpts(maxtype = "place"))
    assert(shifted.map(_.claimedType) === Vector("region"))
    // conflict key: a geocoder_name!=type layer claims its name too, so a
    // same-name different-type feature cannot also stack
    val landmarkSrc = cand(3, "landmark", Seq("poi"), 7, "statue", 0.0,
      "Point", conflict = "landmark")
    val poiSame = cand(2, "landmark", Seq("monument"), 8, "plaque", 0.5,
      "Point", conflict = "landmark")
    val st = Reverse.stackMemo(Vector(landmarkSrc, poiSame), Reverse.StackOpts())
    // statue (finer idx) claims poi + landmark; plaque's claim of
    // "monument" is free but its conflict "landmark" points at statue...
    // reference semantics: plaque still claims monument (memo check is on
    // the TYPE key); statue holds poi+landmark
    assert(st.map(_.cand.text).contains("statue"))
  }

  test("pickPerIdx priority: forward match > ghost match > nearest (R4)") {
    def c(fid: Long, dist: Double, score: Double, matched: Boolean, rnk: Int) =
      Reverse.CandRow(1L, 0, 0, "place", Seq("place"), "", fid,
        fid, s"f$fid", dist, score, "Point", 0, 0, Map.empty, matched, rnk)
    // plain: nearest wins
    assert(Reverse.pickPerIdx(Vector(c(1, 0.1, 1, false, 1),
      c(2, 0.5, 9, false, 2)), false, false, None, None).get.feature_id === 1L)
    // a NEARER matched ghost is stored and beats the plain pick by priority
    // (farther candidates are skipped once a plain feat is accepted —
    // context.js:489 `distance > dist` fires before the ghost logic)
    assert(Reverse.pickPerIdx(Vector(c(2, 0.1, -1, true, 1),
      c(1, 0.5, 1, false, 2)), false, false, None, None).get.feature_id === 2L)
    assert(Reverse.pickPerIdx(Vector(c(1, 0.1, 1, false, 1),
      c(2, 0.5, -1, true, 2)), false, false, None, None).get.feature_id === 1L)
    // unmatched ghost is skipped entirely
    assert(Reverse.pickPerIdx(Vector(c(2, 0.1, -1, false, 1),
      c(1, 0.5, 1, false, 2)), false, false, None, None).get.feature_id === 1L)
    // score filter skips the nearest, surfaces the 2nd-nearest
    assert(Reverse.pickPerIdx(Vector(c(1, 0.1, 1, false, 1),
      c(2, 0.5, 50, false, 2)), false, false, Some((10.0, 100.0)),
      None).get.feature_id === 2L)
    // exclusive target short-circuit
    assert(Reverse.pickPerIdx(Vector(c(1, 0.1, 1, false, 1),
      c(2, 0.5, 1, false, 2)), false, false, None,
      Some(2L)).get.feature_id === 2L)
    assert(Reverse.pickPerIdx(Vector(c(1, 0.1, 1, false, 1)), false, false,
      None, Some(99L)).isEmpty)
  }

  test("reverseLimit returns k per-feature contexts with target exclusivity") {
    val sp = spark; import sp.implicits._
    val pts = Seq((1L, -74.0, 40.9)).toDF("query_id", "lon", "lat")
    val res = Reverse.reverseLimit(spark, index, pts, "street", limit = 3)
      .select(col("rank"), col("place_name"), col("layer"))
      .as[(Int, String, String)].collect().sortBy(_._1)
    assert(res.nonEmpty)
    assert(res.forall(_._3 == "street"), s"got ${res.toSeq}")
    // nearest street leads rank 1 and carries its own context chain
    assert(res.head._2.startsWith("West Lake View Rd"), s"got ${res.toSeq}")
    // deduped: distinct features per rank
    assert(res.map(_._2).distinct.length === res.length, s"got ${res.toSeq}")
  }
}
