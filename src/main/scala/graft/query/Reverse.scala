package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.index.IndexBuilder.CarmenIndex
import graft.ops.GeoOps

/** Batch reverse geocode: points -> per-layer tile lookup -> nearest/PIP
  * pick -> stacked context (reference lib/geocoder/context.js).
  *
  * Per layer the lookup is a partition-prunable equi-join on (z, x, y): the
  * point's tile at the layer zoom, the Spark analog of the reference's
  * LRU-cached vector-tile fetch (context.js:309-371). Containment is exact
  * ray-casting for polygons (direct hit, distance 0); otherwise haversine
  * distance to the feature center with the reference's pick order
  * min(distance, id) and ghost filtering (context.js:480-542).
  */
object Reverse {

  private val pipUdf = udf((geojson: String, lon: Double, lat: Double) =>
    Geom.contains(Geom.fromJson(geojson), lon, lat))

  /** Per-layer best-feature pick for a set of points keyed by `keys`:
    * partition-pruned tile equi-join, PIP direct hits, min (distance, id)
    * per key (context.js:480-542). Shared by reverse geocode and the
    * forward pipeline's context fill (verifymatch.js:542-559).
    */
  def layerPick(points: DataFrame, l: graft.index.IndexBuilder.LayerIndex,
                keys: Seq[String], radiusMiles: Double): DataFrame = {
    val z = l.config.zoom
    val withTile = points
      .withColumn("tx", GeoOps.tileX(col("lon"), z))
      .withColumn("ty", GeoOps.tileY(col("lat"), z))
    val tf = l.tileFeatures
      .select(col("x"), col("y"), col("id").as("feature_id"),
        col("id24"), col("text"), col("score"),
        col("center_lon").as("f_lon"), col("center_lat").as("f_lat"),
        col("geometry"))
    withTile.join(tf, withTile("tx") === tf("x") && withTile("ty") === tf("y"))
      .where(col("score") >= 0) // ghost filter (context.js:518-526)
      .withColumn("direct_hit", pipUdf(col("geometry"), col("lon"), col("lat")))
      .withColumn("dist_miles",
        when(col("direct_hit"), lit(0.0)).otherwise(
          haversineMilesCol(col("lon"), col("lat"), col("f_lon"), col("f_lat"))))
      .where(col("direct_hit") || col("dist_miles") <= radiusMiles)
      .withColumn("pick",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*)
          .orderBy(col("dist_miles"), col("feature_id"))))
      .where(col("pick") === 1)
      .select(keys.map(col) ++ Seq(lit(l.config.idx).as("idx"),
        lit(l.config.name).as("layer"), col("feature_id"), col("text"),
        col("dist_miles"), col("f_lon").as("center_lon"),
        col("f_lat").as("center_lat")): _*)
  }

  def reverse(spark: SparkSession, index: CarmenIndex, points: DataFrame,
              radiusMiles: Double = 48.0): DataFrame = {
    val pts = points.select(col("query_id").cast("long"), col("lon"), col("lat"))
    val perLayer = index.layers.map(l =>
      layerPick(pts, l, Seq("query_id"), radiusMiles))

    // stack: context hierarchy fine -> coarse per query
    val all = perLayer.reduce(_ unionByName _)
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
  def haversineMilesCol(lon1: org.apache.spark.sql.Column, lat1: org.apache.spark.sql.Column,
                        lon2: org.apache.spark.sql.Column, lat2: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) + pow(sin(dLon / 2), 2) * cos(radians(lat1)) * cos(radians(lat2))
    lit(2) * atan2(sqrt(a), sqrt(lit(1) - a)) * lit(6371008.8 / 1609.344)
  }
}
