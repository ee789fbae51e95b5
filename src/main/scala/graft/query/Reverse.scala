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

  private val pipUdf = udf((geojson: String, lon: Double, lat: Double) =>
    Geom.contains(Geom.fromJson(geojson), lon, lat))

  private val geomDistUdf = udf((geojson: String, lon: Double, lat: Double) =>
    Geom.distanceMiles(Geom.fromJson(geojson), lon, lat))

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
            radiusMiles: Double): DataFrame = {
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
      if (radiusMiles > 0) lit(radiusMiles)
      else index.zooms.foldLeft(lit(0.0)) { (acc, z) =>
        when(col("z") === z, lit(zoomRadius(z))).otherwise(acc)
      }

    val tf = index.allTileFeatures
    tiles.join(tf, tiles("z") === tf("z") && tiles("tx") === tf("x") &&
        tiles("ty") === tf("y"))
      .drop(tf("z"))
      .where(col("score") >= 0) // ghost filter (context.js:518-526)
      .withColumn("direct_hit", pipUdf(col("geometry"), col("lon"), col("lat")))
      .withColumn("dist_miles",
        when(col("direct_hit"), lit(0.0)).otherwise(
          geomDistUdf(col("geometry"), col("lon"), col("lat"))))
      .where(col("direct_hit") || col("dist_miles") <= radiusCol)
      .withColumn("pick",
        row_number().over(Window
          .partitionBy((keys :+ "idx").map(col): _*)
          .orderBy(col("dist_miles"), col("feature_id"))))
      .where(col("pick") === 1)
      .select(keys.map(col) ++ Seq(col("idx"), col("layer"), col("feature_id"),
        col("text"), col("dist_miles"), col("f_lon").as("center_lon"),
        col("f_lat").as("center_lat")): _*)
  }

  def reverse(spark: SparkSession, index: CarmenIndex, points: DataFrame,
              radiusMiles: Double = 0.0): DataFrame = {
    val pts = points.select(col("query_id").cast("long"), col("lon"), col("lat"))
    val all = picks(pts, index, Seq("query_id"), radiusMiles)
    all.withColumn("display", substring_index(col("text"), ",", 1))
      .groupBy(col("query_id"))
      .agg(
        concat_ws(", ", transform(array_sort(collect_list(
          struct((lit(100) - col("idx")).as("ord"), col("display")))),
          s => s.getField("display"))).as("place_name"),
        max(struct(col("idx"), col("feature_id"), col("layer"),
          col("center_lon"), col("center_lat"))).as("lead"))
      .select(col("query_id"), col("place_name"),
        col("lead.feature_id").as("feature_id"), col("lead.layer").as("layer"),
        col("lead.center_lon").as("center_lon"),
        col("lead.center_lat").as("center_lat"))
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
