package graft.index

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.{GeoDoc, LayerConfig}

/** Deterministic ~100k-entity benchmark gazetteer: 1 country, 10 regions,
  * `nPlaces` places on a grid, 2 streets per place, and one address
  * document per street (alternating point clusters and TIGER-style
  * interpolation ranges). Everything is synthesized distributed
  * (spark.range -> map) with a fixed layout — no driver-side collections,
  * no randomness — so bench runs are reproducible and regressions in the
  * JOIN path (not index-build overhead) move the numbers.
  *
  * The small [[PageSynth]] gazetteer stays the acceptance fixture; this one
  * exists because a 15-entity index measures fixed planning overhead, not
  * engine throughput.
  */
object BigGazetteer {

  val Syl: Vector[String] = Vector("ba", "ce", "do", "fa", "gu", "ha", "ki",
    "lo", "mi", "nu", "pa", "re", "si", "tu", "ve", "wo", "ya", "zo", "bra",
    "cle", "dri", "flo", "gru", "ste")

  private def cap(s: String): String = s.substring(0, 1).toUpperCase + s.substring(1)

  def word(i: Int): String =
    Syl(i % 24) + Syl((i / 24) % 24) + Syl((i / 576) % 24)

  private val PlaceSfx = Vector("ville", "burg", "ton", "stad")

  /** Unique for i < 24^3 * 4 = 55296. */
  def placeName(i: Int): String =
    cap(word(i % 13824)) + PlaceSfx((i / 13824) % 4)

  val StreetTypes: Vector[String] = Vector("St", "Ave", "Rd", "Blvd", "Ln")

  /** Street j (global): name shared by its address doc. */
  def streetName(j: Int): String =
    cap(word(j / StreetTypes.length)) + " " + StreetTypes(j % StreetTypes.length)

  def regionName(r: Int): String = cap(word(r * 577 + 13)) + " State"

  // world box and grid layout
  val W: Double = -120.0; val E: Double = -60.0
  val S: Double = 25.0; val N: Double = 48.0
  val NRegions = 10

  def grid(nPlaces: Int): Int = math.ceil(math.sqrt(nPlaces.toDouble)).toInt

  def placeCenter(i: Int, nPlaces: Int): (Double, Double) = {
    val g = grid(nPlaces)
    val cw = (E - W) / g
    val ch = (N - S) / g
    (W + (i % g + 0.5) * cw, S + (i / g + 0.5) * ch)
  }

  private def boxJson(w: Double, s: Double, e: Double, n: Double): String =
    s"""{"type":"Polygon","coordinates":[[[$w,$s],[$e,$s],[$e,$n],[$w,$n],[$w,$s]]]}"""
  private def lineJson(x1: Double, y1: Double, x2: Double, y2: Double): String =
    s"""{"type":"LineString","coordinates":[[$x1,$y1],[$x2,$y2]]}"""

  val layerConfigs: Vector[LayerConfig] = Vector(
    LayerConfig("country", idx = 0, zoom = 6, typ = "country"),
    LayerConfig("region", idx = 1, zoom = 6, typ = "region"),
    LayerConfig("place", idx = 2, zoom = 12, typ = "place"),
    LayerConfig("street", idx = 3, zoom = 14, typ = "street"),
    LayerConfig("address", idx = 4, zoom = 14, typ = "address",
      geocoderAddress = true)
  )

  def countryDocs(spark: SparkSession): Dataset[GeoDoc] = {
    import spark.implicits._
    Seq(GeoDoc(1, "Benchland", 1000, boxJson(W, S, E, N),
      (W + E) / 2, (S + N) / 2)).toDS()
  }

  def regionDocs(spark: SparkSession): Dataset[GeoDoc] = {
    import spark.implicits._
    spark.range(NRegions).map { r0 =>
      val r = r0.toInt
      val rw = (E - W) / NRegions
      val w = W + r * rw
      GeoDoc(10 + r, regionName(r), 400 + r, boxJson(w, S, w + rw, N),
        w + rw / 2, (S + N) / 2)
    }
  }

  def placeDocs(spark: SparkSession, nPlaces: Int): Dataset[GeoDoc] = {
    import spark.implicits._
    val n = nPlaces
    spark.range(nPlaces).map { i0 =>
      val i = i0.toInt
      val (cx, cy) = placeCenter(i, n)
      val g = grid(n)
      val cw = (E - W) / g
      val ch = (N - S) / g
      GeoDoc(100000L + i, placeName(i), 50 + (i % 200),
        boxJson(cx - cw * 0.4, cy - ch * 0.4, cx + cw * 0.4, cy + ch * 0.4),
        cx, cy)
    }
  }

  /** 2 streets per place, horizontal lines at 30% / 70% cell height. */
  def streetDocs(spark: SparkSession, nPlaces: Int): Dataset[GeoDoc] = {
    import spark.implicits._
    val n = nPlaces
    spark.range(nPlaces.toLong * 2).map { j0 =>
      val j = j0.toInt
      val i = j / 2
      val (cx, cy) = placeCenter(i, n)
      val g = grid(n)
      val cw = (E - W) / g
      val ch = (N - S) / g
      val y = cy + (if (j % 2 == 0) -0.2 else 0.2) * ch
      GeoDoc(200000L + j, streetName(j), 1 + (j % 20),
        lineJson(cx - cw * 0.3, y, cx + cw * 0.3, y), cx, y)
    }
  }

  /** One address doc per street: even streets carry a 10-point cluster
    * (odd house numbers 1..19), odd streets a TIGER interpolation range
    * 1-99.
    */
  def addressDocs(spark: SparkSession, nPlaces: Int): Dataset[GeoDoc] = {
    import spark.implicits._
    val n = nPlaces
    spark.range(nPlaces.toLong * 2).map { j0 =>
      val j = j0.toInt
      val i = j / 2
      val (cx, cy) = placeCenter(i, n)
      val g = grid(n)
      val cw = (E - W) / g
      val ch = (N - S) / g
      val y = cy + (if (j % 2 == 0) -0.2 else 0.2) * ch
      val x1 = cx - cw * 0.3
      val x2 = cx + cw * 0.3
      if (j % 2 == 0) {
        val pts = (0 until 10).map { k =>
          val x = x1 + (x2 - x1) * (k + 0.5) / 10.0
          s"[$x,$y]"
        }.mkString(",")
        GeoDoc(400000L + j, streetName(j), 0,
          s"""{"type":"GeometryCollection","geometries":[{"type":"MultiPoint","coordinates":[$pts]}]}""",
          cx, y,
          addressnumber = Seq((0 until 10).map(k => (2 * k + 1).toString)))
      } else {
        GeoDoc(400000L + j, streetName(j), 0,
          s"""{"type":"GeometryCollection","geometries":[{"type":"MultiLineString","coordinates":[[[$x1,$y],[$x2,$y]]]}]}""",
          cx, y,
          rangetype = "tiger",
          lfromhn = Seq(Seq("2")), ltohn = Seq(Seq("98")),
          rfromhn = Seq(Seq("1")), rtohn = Seq(Seq("99")),
          parityl = Seq(Seq("E")), parityr = Seq(Seq("O")))
      }
    }
  }

  def buildIndex(spark: SparkSession, nPlaces: Int): IndexBuilder.CarmenIndex =
    IndexBuilder.build(spark, Seq(
      (layerConfigs(0), countryDocs(spark)),
      (layerConfigs(1), regionDocs(spark)),
      (layerConfigs(2), placeDocs(spark, nPlaces)),
      (layerConfigs(3), streetDocs(spark, nPlaces)),
      (layerConfigs(4), addressDocs(spark, nPlaces))))

  /** Deterministic forward-query workload over the gazetteer: street+place,
    * bare place, house-number+street and place+region patterns.
    */
  def forwardQueries(spark: SparkSession, nQueries: Int,
                     nPlaces: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val n = nPlaces
    spark.range(nQueries).map { q0 =>
      val q = q0.toInt
      val i = (q * 7919) % n           // place index (co-prime stride)
      val j = i * 2 + (q % 2)          // one of the place's streets
      val text = q % 4 match {
        case 0 => s"${streetName(j)} ${placeName(i)}"
        case 1 => placeName(i)
        case 2 => s"${2 * (q % 9) + 1} ${streetName(j)}"
        case _ => s"${placeName(i)} ${regionName(i % NRegions)}"
      }
      (q.toLong, text)
    }.toDF("query_id", "query")
  }

  /** House-number workload: "num street place" queries resolving through
    * the address layer — even streets via the 10-point cluster (odd numbers
    * 1..19), odd streets via the TIGER interpolation range 1..99.
    */
  def addressQueries(spark: SparkSession, nQueries: Int,
                     nPlaces: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val n = nPlaces
    spark.range(nQueries).map { q0 =>
      val q = q0.toInt
      val i = (q * 7919) % n
      val j = i * 2 + (q % 2)
      val num = if (j % 2 == 0) 2 * (q % 10) + 1 else 1 + (q % 99)
      (q.toLong, s"$num ${streetName(j)} ${placeName(i)}")
    }.toDF("query_id", "query")
  }

  /** The same workload with one transposition typo in the street/place word
    * (exercises the symmetric-delete fuzzy join).
    */
  def fuzzyQueries(spark: SparkSession, nQueries: Int,
                   nPlaces: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val n = nPlaces
    def typo(w: String): String =
      if (w.length < 5) w
      else {
        val p = 1 + (w.length % (w.length - 2))
        val a = w.toCharArray
        val t = a(p); a(p) = a(p + 1); a(p + 1) = t
        new String(a)
      }
    spark.range(nQueries).map { q0 =>
      val q = q0.toInt
      val i = (q * 104729) % n
      val j = i * 2 + (q % 2)
      val sn = streetName(j)
      val first = sn.split(" ")(0)
      val rest = sn.substring(first.length)
      (q.toLong, s"${typo(first)}$rest ${placeName(i)}")
    }.toDF("query_id", "query")
  }

  /** Reverse points jittered around place centers. */
  def reversePoints(spark: SparkSession, nQueries: Int,
                    nPlaces: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val n = nPlaces
    spark.range(nQueries).map { q0 =>
      val q = q0.toInt
      val i = (q * 7919) % n
      val (cx, cy) = placeCenter(i, n)
      val g = grid(n)
      val jx = ((q % 7) - 3) * 0.02 * (E - W) / g
      val jy = ((q % 5) - 2) * 0.02 * (N - S) / g
      (q.toLong, cx + jx, cy + jy)
    }.toDF("query_id", "lon", "lat")
  }
}
