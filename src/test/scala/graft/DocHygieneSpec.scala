package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Geom
import graft.index.DocHygiene
import graft.model.GeoDoc

/** Index-time hygiene ops (I1/I2/I4/I5/I6). */
class DocHygieneSpec extends AnyFunSuite {

  private val pt = """{"type":"Point","coordinates":[1,2]}"""

  test("I1 validation flags missing pieces") {
    assert(DocHygiene.validate(GeoDoc(1, "x", 0, pt, 1, 2)).isEmpty)
    assert(DocHygiene.validate(GeoDoc(0, "x", 0, pt, 1, 2)).isDefined)
    assert(DocHygiene.validate(GeoDoc(1, "", 0, pt, 1, 2)).isDefined)
    assert(DocHygiene.validate(GeoDoc(1, "x", 0, "", 1, 2)).isDefined)
    // synonym cap applies only to address-bearing docs
    val manySyn = (1 to 12).map(i => s"syn$i").mkString(",")
    assert(DocHygiene.validate(GeoDoc(1, manySyn, 0, pt, 1, 2)).isEmpty)
    assert(DocHygiene.validate(GeoDoc(1, manySyn, 0, pt, 1, 2,
      addressnumber = Seq(Seq("1")))).isDefined)
  }

  test("I2 rewind enforces exterior-CCW, holes-CW") {
    val cw = Vector((0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0), (0.0, 0.0))
    val ccw = cw.reverse
    val fixed = DocHygiene.rewind(Geom.Polygon(Vector(cw, ccw)))
    fixed match {
      case Geom.Polygon(rings) =>
        assert(rings(0) === ccw, "outer ring flipped to CCW")
        assert(rings(1) === cw, "hole flipped to CW")
      case g => fail(s"unexpected $g")
    }
  }

  test("I4 cover cap keeps the covers closest to the center") {
    val zxy = (0 until 10050).map(i => s"14/${8000 + i}/8000")
    val capped = DocHygiene.capCovers(zxy, -4.1748, 0.0, 14) // ~tile x=8002
    assert(capped.length === DocHygiene.MaxCovers)
    assert(capped.contains("14/8002/8000"))
    assert(!capped.contains(s"14/${8000 + 10049}/8000"), "farthest dropped")
  }

  test("I5 outlier clamp pulls 5000 into the data bound") {
    val doc = GeoDoc(1, "main st", 0, pt, 1, 2,
      addressnumber = Seq(Seq("1", "2", "3", "4", "5", "6", "7", "8", "9", "5000")),
      rangetype = "tiger",
      lfromhn = Seq(Seq("1", "5000")), ltohn = Seq(Seq("9", "5000")))
    val out = DocHygiene.clampRanges(doc)
    assert(out.lfromhn.head(0) === "1")
    assert(out.lfromhn.head(1) != "5000", s"clamped: ${out.lfromhn}")
    assert(graft.core.JsNum.parseIntPrefix(out.lfromhn.head(1)) <= 9)
  }

  test("I5 no clamp without outliers") {
    val doc = GeoDoc(1, "main st", 0, pt, 1, 2,
      addressnumber = Seq(Seq("1", "3", "5", "7", "9")),
      lfromhn = Seq(Seq("1")), ltohn = Seq(Seq("9")))
    assert(DocHygiene.clampRanges(doc) === doc)
  }

  test("I6 center verification and centroid fallback") {
    // tile 14/8192/8192 covers [0, 0.02197) x (-0.02197, 0]
    assert(DocHygiene.verifyCenter(0.01, -0.01, Seq("14/8192/8192")))
    assert(!DocHygiene.verifyCenter(5.0, 5.0, Seq("14/8192/8192")))
    val line = """{"type":"LineString","coordinates":[[0,0],[2,2]]}"""
    val fixed = DocHygiene.fixCenter(
      GeoDoc(1, "x", 0, line, 50, 50), Seq("14/8192/8192"))
    assert(fixed.centerLon === 1.0 && fixed.centerLat === 1.0)
  }

  test("I18 addrTransform lifts MultiPoint clusters and lowercases numbers") {
    val mp = """{"type":"MultiPoint","coordinates":[[0,0],[0,1]]}"""
    val doc = GeoDoc(1, "fake st", 0, mp, 0, 0,
      addressnumber = Seq(Seq("9B", "10C")))
    val out = DocHygiene.addrTransform(doc)
    assert(out.isRight, s"got $out")
    val d = out.toOption.get
    assert(d.addressnumber === Seq(Seq("9b", "10c")))
    Geom.fromJson(d.geometry) match {
      case Geom.Collection(Vector(Geom.MultiPoint(pts))) =>
        assert(pts === Vector((0.0, 0.0), (0.0, 1.0)))
      case g => fail(s"not lifted: $g")
    }
  }

  test("I18 addrTransform rejects misaligned parallel arrays") {
    val mp = """{"type":"MultiPoint","coordinates":[[0,0],[0,1]]}"""
    val bad = GeoDoc(1, "fake st", 0, mp, 0, 0,
      addressnumber = Seq(Seq("9B", "10C", "11")))
    assert(DocHygiene.addrTransform(bad) ===
      Left("carmen:addressnumber[i] array must be equal to geometry.geometries[i] array"))
    val point = """{"type":"Point","coordinates":[0,0]}"""
    assert(DocHygiene.addrTransform(GeoDoc(1, "x", 0, point, 0, 0,
      addressnumber = Seq(Seq("1")))) ===
      Left("carmen:addressnumber must be MultiPoint or GeometryCollection"))
  }

  test("I18 addrTransform lifts ITP LineString and fills range props") {
    val line = """{"type":"LineString","coordinates":[[0,0],[1,1]]}"""
    val doc = GeoDoc(1, "interp rd", 0, line, 0.5, 0.5,
      rangetype = "tiger", lfromhn = Seq(Seq("2")), ltohn = Seq(Seq("98")))
    val out = DocHygiene.addrTransform(doc)
    assert(out.isRight, s"got $out")
    val d = out.toOption.get
    Geom.fromJson(d.geometry) match {
      case Geom.Collection(Vector(Geom.MultiLineString(ls))) =>
        assert(ls === Vector(Vector((0.0, 0.0), (1.0, 1.0))))
      case g => fail(s"not lifted: $g")
    }
    assert(d.parityl === Seq(Seq.empty), "missing range props filled")
    assert(d.lfromhn === Seq(Seq("2")))
  }

  test("I1/I18 wired into the build: invalid docs land in quarantine") {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    try {
      val sp = spark
      def docs(d: GeoDoc*) = sp.createDataset(d)(org.apache.spark.sql.Encoders.product[GeoDoc])
      val idx = graft.index.IndexBuilder.build(spark, Seq(
        (graft.model.LayerConfig("place", idx = 0, zoom = 6, typ = "place"),
          docs(
            GeoDoc(1, "Goodtown", 1, pt, 1, 2),
            GeoDoc(0, "NoId", 1, pt, 1, 2),                   // I1: no id
            GeoDoc(3, "", 1, pt, 1, 2),                       // I1: no text
            GeoDoc(4, "Badcluster", 1, pt, 1, 2,
              addressnumber = Seq(Seq("1")))))))              // I18: bad shape
      val layer = idx.layers.head
      val q = layer.quarantine.collect().map(r => (r.getLong(0), r.getString(1))).toMap
      assert(q.keySet === Set(0L, 3L, 4L), s"got $q")
      assert(q(4L) === "carmen:addressnumber must be MultiPoint or GeometryCollection")
      assert(layer.features.select("id").collect().map(_.getLong(0)).toSet === Set(1L),
        "only the valid doc is indexed")
    } finally spark.stop()
  }

  test("S9 vectorizable expansion: per-number points + per-segment lines") {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    try {
      val sp = spark
      val gc = """{"type":"GeometryCollection","geometries":[{"type":"MultiPoint","coordinates":[[0,0],[0,1]]},{"type":"MultiLineString","coordinates":[[[0,0],[1,1]],[[2,2],[3,3]]]}]}"""
      val d = sp.createDataset(Seq(
        GeoDoc(1, "fake st", 0, gc, 0, 0,
          addressnumber = Seq(Seq("9b", "10c"), Seq.empty),
          rangetype = "tiger",
          lfromhn = Seq(Seq.empty, Seq("2", "100")),
          ltohn = Seq(Seq.empty, Seq("98", "198"))),
        GeoDoc(2, "plain", 0, pt, 1, 2)))(
        org.apache.spark.sql.Encoders.product[GeoDoc])
      val v = graft.index.IndexBuilder.vectorizable(sp, d).collect()
      assert(v.count(_.kind == "address") === 2)
      assert(v.count(_.kind == "range") === 2)
      assert(v.count(_.kind == "feature") === 1)
      assert(v.filter(_.kind == "address").map(_.number).toSet === Set("9b", "10c"))
    } finally spark.stop()
  }

  test("S10 analyze: counts by score/relev + duplicate check") {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    try {
      import spark.implicits._
      val postings = Seq(
        ("a st", "", 1.0, 3, 10L, 5, 5),
        ("a st", "", 1.0, 3, 10L, 5, 5), // duplicate grid
        ("b st", "", 0.8, 1, 11L, 6, 6)
      ).toDF("phrase", "lang_set", "relev", "score3", "id24", "x", "y")
      val stats = graft.index.IndexBuilder.analyze(postings)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(stats("total") === 3)
      assert(stats("score_3") === 2)
      assert(stats("relev_0.8") === 1)
      assert(stats("duplicate_grids") === 1)
    } finally spark.stop()
  }
}
