package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core._
import graft.index.IndexBuilder.CarmenIndex
import graft.ops.GeoOps

/** Batch reverse geocode: points -> per-layer tile lookup -> nearest/PIP
  * pick -> stacked context (reference lib/geocoder/context.js).
  *
  * The lookup is ONE partition-prunable equi-join: each point explodes to
  * its tile at every distinct layer zoom, joined against the unified
  * tile_features table on (z, x, y) — the Spark analog of the reference's
  * LRU-cached per-layer vector-tile fetch (context.js:309-371), but with a
  * single shuffle regardless of layer count. Containment is exact
  * ray-casting for polygons (direct hit, distance 0); otherwise haversine
  * distance to the feature center with the reference's pick order
  * min(distance, id) and ghost filtering (context.js:480-542).
  */
object Reverse {

  // PIP/distance over the PRE-PARSED binary geometry column (geom_bin,
  // written at index-build time): no JSON parse in any per-candidate path —
  // this join is hit by every reverse geocode and every forward context fill.
  private val pipUdf = udf((bin: Array[Byte], lon: Double, lat: Double) =>
    Geom.contains(Geom.fromBin(bin), lon, lat))

  private val geomDistUdf = udf((bin: Array[Byte], lon: Double, lat: Double) =>
    Geom.distanceMiles(Geom.fromBin(bin), lon, lat))

  /** distscore as a Column (reference lib/util/proximity.js:192-198). */
  def distscoreCol(dist: Column, score: Column): Column =
    round(score * (lit(1000.0) / greatest(dist, lit(35.0))) * lit(1.0e4)) / lit(1.0e4)

  /** The reference's vtquery radius: 1000 web-mercator units of a 4096-unit
    * tile at the layer zoom, converted to miles at the equator
    * (reference lib/geocoder/context.js:583).
    */
  def vtqueryRadiusMiles(zoom: Int): Double =
    24901.46 / (1L << zoom) * (1000.0 / 4096.0)

  /** Best feature per (keys, layer) for a set of points: single tile join
    * over all layers. Shared by reverse geocode and forward context fill.
    * radiusMiles <= 0 selects the per-layer vtquery default radius.
    */
  def picks(points: DataFrame, index: CarmenIndex, keys: Seq[String],
            radiusMiles: Double): DataFrame =
    picksDetailed(points, index, keys, ReverseOptions(radiusMiles = radiusMiles))
      .select(keys.map(col) ++ Seq(col("idx"), col("layer"), col("feature_id"),
        col("text"), col("dist_miles"), col("score"), col("center_lon"),
        col("center_lat"), col("lang_texts")): _*)

  /** picks with score/geometry-type columns, score-range filtering, and the
    * per-layer distscore ordering of reverse score mode
    * (reference context.js:456-471, R5).
    */
  def picksDetailed(points: DataFrame, index: CarmenIndex, keys: Seq[String],
                    opts: ReverseOptions): DataFrame = {
    // explode each point to its tile at every distinct layer zoom
    val tiles = index.zooms.map { z =>
      points.withColumn("z", lit(z))
        .withColumn("tx", GeoOps.tileX(col("lon"), z))
        .withColumn("ty", GeoOps.tileY(col("lat"), z))
    }.reduce(_ unionByName _)

    // per-layer default radius = vtquery's 1000 mercator units at the
    // layer's zoom; an explicit positive radius overrides it
    val zoomRadius = index.zooms.map(z => z -> vtqueryRadiusMiles(z)).toMap
    val radiusCol =
      if (opts.radiusMiles > 0) lit(opts.radiusMiles)
      else index.zooms.foldLeft(lit(0.0)) { (acc, z) =>
        when(col("z") === z, lit(zoomRadius(z))).otherwise(acc)
      }

    val tf = index.allTileFeatures
    val cand0 = tiles.join(tf, tiles("z") === tf("z") && tiles("tx") === tf("x") &&
        tiles("ty") === tf("y"))
      .drop(tf("z"))
      .where(col("score") >= 0) // ghost filter (context.js:518-526)
      .withColumn("direct_hit", pipUdf(col("geom_bin"), col("lon"), col("lat")))
      .withColumn("dist_miles",
        when(col("direct_hit"), lit(0.0)).otherwise(
          geomDistUdf(col("geom_bin"), col("lon"), col("lat"))))
      .where(col("direct_hit") || col("dist_miles") <= radiusCol)
    val cand = opts.scoreFilter match {
      case Some((lo, hi)) => cand0.where(col("score") > lo && col("score") <= hi)
      case None => cand0
    }
    val ordering =
      if (opts.reverseMode == "score")
        Seq(distscoreCol(col("dist_miles"), col("score")).desc,
          col("dist_miles").asc, col("feature_id").asc)
      else Seq(col("dist_miles").asc, col("feature_id").asc)
    cand
      .withColumn("pick",
        row_number().over(Window
          .partitionBy((keys :+ "idx").map(col): _*)
          .orderBy(ordering: _*)))
      .where(col("pick") === 1)
      .select(keys.map(col) ++ Seq(col("idx"), col("layer"), col("feature_id"),
        col("text"), col("dist_miles"), col("score"), col("geom_type"),
        col("f_lon").as("center_lon"), col("f_lat").as("center_lat"),
        col("langTexts").as("lang_texts")): _*)
  }

  final case class ReverseOptions(
      limit: Int = 1,
      reverseMode: String = "distance", // "distance" | "score" (R5)
      types: Seq[String] = Nil,         // result-type filter (F2-lite)
      scoreFilter: Option[(Double, Double)] = None, // scoreranges window
      radiusMiles: Double = 0.0)

  /** One per-layer pick feeding stackFeatures. */
  final case class PickRow(query_id: Long, idx: Int, layer: String, typ: String,
                           feature_id: Long, text: String, dist_miles: Double,
                           score: Double, geom_type: String,
                           center_lon: Double, center_lat: Double)

  final case class StackedRow(query_id: Long, place_name: String,
                              feature_id: Long, layer: String,
                              center_lon: Double, center_lat: Double,
                              rank: Int = 1)

  /** stackFeatures (reference context.js:168-254), single-type-per-layer
    * model: walk picks fine->coarse, claim one feature per type; a later
    * (coarser) non-Polygon feature replaces a claimed one only if closer
    * (or higher-scored in score mode), and requested-type filtering applies
    * until the first claim.
    */
  def stackFeatures(rows: Vector[PickRow], opts: ReverseOptions): Option[StackedRow] =
    stackContexts(rows, opts).headOption

  /** stackFeatures + R10 context splitting (reference geocode.js:299-310):
    * the context hierarchy becomes suffix contexts
    * [[poi,place,country],[place,country],[country]], each relevance 1,
    * ranked; `opts.limit` bounds how many are returned.
    */
  def stackContexts(rows: Vector[PickRow], opts: ReverseOptions): Vector[StackedRow] = {
    stackMemo(rows, opts) match {
      case None => Vector.empty
      case Some(context) =>
        (0 until math.min(math.max(opts.limit, 1), context.length)).map { i =>
          val suffix = context.drop(i)
          val lead = suffix.head
          StackedRow(lead.query_id,
            suffix.map(f => f.text.split(",")(0)).mkString(", "),
            lead.feature_id, lead.layer, lead.center_lon, lead.center_lat,
            rank = i + 1)
        }.toVector
    }
  }

  private def stackMemo(rows: Vector[PickRow], opts: ReverseOptions): Option[Vector[PickRow]] = {
    val wanted = opts.types.toSet
    val scoreMode = opts.reverseMode == "score"
    val memo = scala.collection.mutable.LinkedHashMap.empty[String, PickRow]
    var firstType: Option[String] = None
    for (f <- rows.sortBy(-_.idx)) {
      val typ = f.typ
      val typeOk = wanted.isEmpty || wanted.contains(typ)
      memo.get(typ) match {
        case None =>
          if (firstType.isDefined || typeOk) {
            memo(typ) = f
            if (firstType.isEmpty) firstType = Some(typ)
          }
        case Some(cur) if f.geom_type != "Polygon" =>
          val scoreBlocks = scoreMode && cur.score >= f.score
          val distBlocks = f.dist_miles >= cur.dist_miles
          val typeBlocks = wanted.nonEmpty && !typeOk
          if (!scoreBlocks && !distBlocks && !typeBlocks) memo(typ) = f
        case _ =>
      }
    }
    if (memo.isEmpty) None
    else Some(memo.values.toVector.distinct.sortBy(-_.idx))
  }

  private def pickRows(spark: SparkSession, index: CarmenIndex,
                       pts: DataFrame, opts: ReverseOptions): org.apache.spark.sql.Dataset[PickRow] = {
    import spark.implicits._
    val typByIdx = index.layers.map(l => l.config.idx -> l.config.typ).toMap
    val typCol = index.layers.foldLeft(lit("")) { (acc, l) =>
      when(col("idx") === l.config.idx, lit(l.config.typ)).otherwise(acc)
    }
    var all = picksDetailed(pts, index, Seq("query_id"), opts)
      .withColumn("typ", typCol)
    val _ = typByIdx
    all.select(col("query_id").cast("long"), col("idx"), col("layer"),
      col("typ"), col("feature_id"), col("text"), col("dist_miles"),
      col("score"), col("geom_type"), col("center_lon"), col("center_lat"))
      .as[PickRow]
  }

  def reverse(spark: SparkSession, index: CarmenIndex, points: DataFrame,
              radiusMiles: Double = 0.0): DataFrame =
    reverseWithOptions(spark, index, points,
      ReverseOptions(radiusMiles = radiusMiles))

  /** Post-stack address snap row (R7/R6 input). */
  final case class SnapRaw(query_id: Long, rank: Int, place_name: String,
                           feature_id: Long, layer: String,
                           center_lon: Double, center_lat: Double,
                           q_lon: Double, q_lat: Double,
                           fGeomBin: Array[Byte], fAddrnum: Seq[Seq[String]],
                           fRangetype: String,
                           fLfromhn: Seq[Seq[String]], fLtohn: Seq[Seq[String]],
                           fRfromhn: Seq[Seq[String]], fRtohn: Seq[Seq[String]],
                           fParityl: Seq[Seq[String]], fParityr: Seq[Seq[String]])

  def reverseWithOptions(spark: SparkSession, index: CarmenIndex,
                         points: DataFrame, opts: ReverseOptions): DataFrame = {
    import spark.implicits._
    val pts = points.select(col("query_id").cast("long"), col("lon"), col("lat"))
    val optsB = opts
    val stacked = pickRows(spark, index, pts, opts)
      .groupByKey(_.query_id)
      .flatMapGroups((_, it) => stackContexts(it.toVector, optsB).iterator)
      .toDF()

    val addressLayers = index.layers.filter(_.config.geocoderAddress)
    val base = stacked.select(col("query_id"), col("rank"), col("place_name"),
      col("feature_id"), col("layer"), col("center_lon"), col("center_lat"))
    if (addressLayers.isEmpty) base
    else {
      // R7 addresscluster.reverse + R6 ITP arbitration (reference
      // addresscluster.js:228-273, context.js:694-716): leads on address
      // layers snap to the nearest cluster point and/or interpolated range
      // point; the ITP point wins when it is closer to the query AND more
      // than 200 m from the cluster point.
      val emptyNested = lit(array()).cast("array<array<string>>")
      val feats = addressLayers.map { l =>
        l.features.select(lit(l.config.name).as("layer"),
          col("id").as("feature_id"), col("geom_bin").as("fGeomBin"),
          col("addressnumber").as("fAddrnum"),
          col("rangetype").as("fRangetype"),
          col("lfromhn").as("fLfromhn"), col("ltohn").as("fLtohn"),
          col("rfromhn").as("fRfromhn"), col("rtohn").as("fRtohn"),
          col("parityl").as("fParityl"), col("parityr").as("fParityr"))
      }.reduce(_ unionByName _)
      val raw = stacked
        .join(pts.withColumnRenamed("lon", "q_lon").withColumnRenamed("lat", "q_lat"),
          Seq("query_id"))
        .join(feats, Seq("layer", "feature_id"), "left")
        .select(col("query_id"), col("rank"), col("place_name"),
          col("feature_id"), col("layer"), col("center_lon"), col("center_lat"),
          col("q_lon"), col("q_lat"),
          coalesce(col("fGeomBin"), lit(Array.emptyByteArray)).as("fGeomBin"),
          coalesce(col("fAddrnum"), emptyNested).as("fAddrnum"),
          coalesce(col("fRangetype"), lit("")).as("fRangetype"),
          coalesce(col("fLfromhn"), emptyNested).as("fLfromhn"),
          coalesce(col("fLtohn"), emptyNested).as("fLtohn"),
          coalesce(col("fRfromhn"), emptyNested).as("fRfromhn"),
          coalesce(col("fRtohn"), emptyNested).as("fRtohn"),
          coalesce(col("fParityl"), emptyNested).as("fParityl"),
          coalesce(col("fParityr"), emptyNested).as("fParityr"))
        .as[SnapRaw]
      raw.map { r =>
        val parts: Vector[Geom] =
          if (r.fGeomBin.isEmpty) Vector.empty
          else Geom.fromBin(r.fGeomBin) match {
            case Geom.Collection(gs) => gs
            case _ => Vector.empty
          }
        // addrpt: nearest cluster point (R7)
        val addrpt =
          if (r.fAddrnum.isEmpty || parts.isEmpty) None
          else AddressCluster.reverse(
            r.fAddrnum.toVector.zipWithIndex.map { case (nums, k) =>
              parts.lift(k) match {
                case Some(Geom.MultiPoint(mp)) => AddressCluster.Part(nums.toVector, mp)
                case _ => AddressCluster.Part(nums.toVector, Vector.empty,
                  isMultiPoint = false)
              }
            }, r.q_lon, r.q_lat)
        // addritp: interpolated point on the nearest range line (V8)
        val addritp =
          if (r.fRangetype.isEmpty || parts.isEmpty) None
          else {
            val itpParts = parts.zipWithIndex.map { case (g, k) =>
              val lines = g match {
                case Geom.MultiLineString(ls) => ls
                case _ => Vector.empty[Vector[(Double, Double)]]
              }
              def at(v: Seq[Seq[String]]): Vector[String] =
                if (k < v.length) v(k).toVector else Vector.empty
              AddressItp.Part(lines, at(r.fLfromhn), at(r.fLtohn),
                at(r.fRfromhn), at(r.fRtohn), at(r.fParityl), at(r.fParityr),
                isMultiLineString = lines.nonEmpty)
            }
            AddressItp.reverse(itpParts, r.q_lon, r.q_lat)
          }
        def km(lon1: Double, lat1: Double, lon2: Double, lat2: Double) =
          Mercator.haversineMiles(lon1, lat1, lon2, lat2) * 1.609344
        // R6 arbitration (context.js:703-716)
        val chosen: Option[(Option[String], Double, Double)] = (addrpt, addritp) match {
          case (Some(pt), Some((inum, ilon, ilat))) =>
            val qToItp = km(r.q_lon, r.q_lat, ilon, ilat)
            val qToPt = km(r.q_lon, r.q_lat, pt.lon, pt.lat)
            val ptToItp = km(pt.lon, pt.lat, ilon, ilat)
            if (qToItp < qToPt && ptToItp > 0.2)
              Some((inum.map(_.toString), ilon, ilat))
            else Some((Some(pt.number), pt.lon, pt.lat))
          case (Some(pt), None) => Some((Some(pt.number), pt.lon, pt.lat))
          case (None, Some((inum, ilon, ilat))) =>
            Some((inum.map(_.toString), ilon, ilat))
          case _ => None
        }
        chosen match {
          case Some((Some(num), lon, lat)) =>
            StackedRow(r.query_id, s"$num ${r.place_name}", r.feature_id,
              r.layer, lon, lat, r.rank)
          case Some((None, lon, lat)) =>
            StackedRow(r.query_id, r.place_name, r.feature_id, r.layer,
              lon, lat, r.rank)
          case None => StackedRow(r.query_id, r.place_name, r.feature_id,
            r.layer, r.center_lon, r.center_lat, r.rank)
        }
      }.toDF()
        .select(col("query_id"), col("rank"), col("place_name"),
          col("feature_id"), col("layer"), col("center_lon"), col("center_lat"))
    }
  }

  /** nearest / limit>1 reverse (reference context.js:268-304 + R9): k
    * nearest features of a type per point from a 3x3 tile neighborhood,
    * each then given its own context at the feature's location.
    */
  def nearestK(spark: SparkSession, index: CarmenIndex, points: DataFrame,
               typ: String, limit: Int,
               opts: ReverseOptions = ReverseOptions()): DataFrame = {
    import spark.implicits._
    val pts = points.select(col("query_id").cast("long"), col("lon"), col("lat"))
    val layersOfType = index.layers.filter(_.config.typ == typ)
    require(layersOfType.nonEmpty, s"no layer of type $typ")

    // 3x3 tile neighborhood at each matching layer's zoom — one equi-join
    val tiles = layersOfType.map(_.config.zoom).distinct.map { z =>
      pts.withColumn("z", lit(z))
        .withColumn("tx0", GeoOps.tileX(col("lon"), z))
        .withColumn("ty0", GeoOps.tileY(col("lat"), z))
    }.reduce(_ unionByName _)
      .withColumn("dxy", explode(lit((for (dx <- -1 to 1; dy <- -1 to 1)
        yield Array(dx, dy)).toArray)))
      .withColumn("tx", col("tx0") + col("dxy").getItem(0))
      .withColumn("ty", col("ty0") + col("dxy").getItem(1))
      .drop("dxy", "tx0", "ty0")

    val tf = index.allTileFeatures
      .where(col("idx").isin(layersOfType.map(_.config.idx): _*))
    val cand = tiles.join(tf, tiles("z") === tf("z") && tiles("tx") === tf("x") &&
        tiles("ty") === tf("y"))
      .drop(tf("z"))
      .where(col("score") >= 0)
      .withColumn("dist_miles", when(
        pipUdf(col("geom_bin"), col("lon"), col("lat")), lit(0.0)).otherwise(
        geomDistUdf(col("geom_bin"), col("lon"), col("lat"))))
    val filtered = opts.scoreFilter match {
      case Some((lo, hi)) => cand.where(col("score") > lo && col("score") <= hi)
      case None => cand
    }
    val ordered =
      if (opts.reverseMode == "score")
        filtered.withColumn("rank", row_number().over(Window
          .partitionBy(col("query_id"))
          .orderBy(distscoreCol(col("dist_miles"), col("score")).desc,
            col("dist_miles"), col("feature_id"))))
      else
        filtered.withColumn("rank", row_number().over(Window
          .partitionBy(col("query_id"))
          .orderBy(col("dist_miles"), col("feature_id"))))
    ordered.where(col("rank") <= limit)
      // dedupe features that appear in several neighborhood tiles
      .dropDuplicates("query_id", "feature_id")
      .select(col("query_id"), col("rank"), col("feature_id"),
        col("layer"), col("text"), col("dist_miles"),
        col("f_lon").as("center_lon"), col("f_lat").as("center_lat"))
  }

  /** id geocode (reference geocode.js:150-204, R2): "{layerName}.{id}". */
  def idGeocode(spark: SparkSession, index: CarmenIndex,
                queries: DataFrame): DataFrame = {
    val parsed = queries.select(col("query_id").cast("long"),
      substring_index(col("query"), ".", 1).as("q_layer"),
      substring_index(col("query"), ".", -1).cast("long").as("q_id"))
    val feats = index.layers.map { l =>
      l.features.select(lit(l.config.name).as("q_layer"), col("id").as("q_id"),
        col("text"), col("center_lon"), col("center_lat"))
    }.reduce(_ unionByName _)
    parsed.join(feats, Seq("q_layer", "q_id"))
      .select(col("query_id"), col("q_layer").as("layer"),
        col("q_id").as("feature_id"),
        substring_index(col("text"), ",", 1).as("place_name"),
        col("center_lon"), col("center_lat"))
  }

  /** asReverse (reference termops.js:145-155): "lon,lat" -> reverse point. */
  def asReverse(query: String): Option[(Double, Double)] = {
    val parts = query.split(",", 3)
    if (parts.length != 2) None
    else {
      val lon = JsNum.jsNumber(parts(0).trim)
      val lat = JsNum.jsNumber(parts(1).trim)
      if (lon.isNaN || lat.isNaN) None else Some((lon, lat))
    }
  }

  /** Haversine miles as a pure Column expression (codegen). */
  def haversineMilesCol(lon1: Column, lat1: Column,
                        lon2: Column, lat2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) + pow(sin(dLon / 2), 2) * cos(radians(lat1)) * cos(radians(lat2))
    lit(2) * atan2(sqrt(a), sqrt(lit(1) - a)) * lit(6371008.8 / 1609.344)
  }
}
