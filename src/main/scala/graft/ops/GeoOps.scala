package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Columnar Web-Mercator tile math (whole-stage codegen; no UDFs) — the
  * vectorized batch counterpart of the exact scalar port in
  * [[graft.core.Mercator]]. Used for bulk tile assignment where the input
  * is guaranteed in-range; the scalar port handles clamping edge cases.
  */
object GeoOps {

  /** Tile x at zoom for lon in [-180, 180). */
  def tileX(lon: Column, z: Int): Column =
    floor(lit(math.pow(2, z)) * (lon / 360.0 + 0.5)).cast("long")

  /** Tile y at zoom for |lat| < 85.05. */
  def tileY(lat: Column, z: Int): Column = {
    val s = sin(radians(lat))
    floor(lit(math.pow(2, z)) *
      (lit(0.5) - lit(0.25) * log((lit(1.0) + s) / (lit(1.0) - s)) / math.Pi)).cast("long")
  }

  /** Deterministic synthetic points derived from the `part` table keys —
    * offset +0.5 keeps every point well away from tile boundaries at z <= 8
    * so tile assignment is engine-exact.
    */
  def syntheticPoints(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.part(spark, sfDir).select(
      col("p_partkey"),
      ((col("p_partkey") * 7) % 360 - 180 + lit(0.5)).cast("double").as("lon"),
      ((col("p_partkey") * 13) % 140 - 70 + lit(0.5)).cast("double").as("lat"))
  }

  /** SQL fragment used by the DuckDB oracle for the same synthetic points. */
  val syntheticPointsSql: String =
    """SELECT p_partkey,
      |  CAST((p_partkey * 7) % 360 - 180 + 0.5 AS DOUBLE) AS lon,
      |  CAST((p_partkey * 13) % 140 - 70 + 0.5 AS DOUBLE) AS lat
      |FROM part""".stripMargin

  def tileXSql(lonExpr: String, z: Int): String =
    s"CAST(floor(pow(2, $z) * ($lonExpr / 360.0 + 0.5)) AS BIGINT)"

  def tileYSql(latExpr: String, z: Int): String =
    s"CAST(floor(pow(2, $z) * (0.5 - 0.25 * ln((1.0 + sin(radians($latExpr))) / " +
      s"(1.0 - sin(radians($latExpr)))) / pi())) AS BIGINT)"
}
