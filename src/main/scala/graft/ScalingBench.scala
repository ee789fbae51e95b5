package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Two-parallelism scaling benchmark (the north rule's N -> 4N executor
  * criterion; sandbox stand-in: the SAME job at local[8] and local[32] on
  * identical input, one JVM per level so JIT warmup cannot leak between
  * levels).
  *
  * Usage: runMain graft.ScalingBench <cpus>
  * Prints one JSON line: throughputs for the three workloads at this level.
  * scripts/run_scaling.sh runs both levels and computes efficiency.
  *
  * Workloads:
  *  A. page ingest + geo extraction (the 100 TB-shaped stage) — docs/sec
  *  B. batch forward geocode-join — queries/sec
  *  C. bulk tile assignment, map-only (codegen mercator math) — points/sec
  */
object ScalingBench {
  private val NPages = sys.env.getOrElse("SPARK_GRAFT_SCALE_PAGES", "1500000").toInt
  private val NQueries = sys.env.getOrElse("SPARK_GRAFT_SCALE_QUERIES", "20000").toInt
  private val NPoints = sys.env.getOrElse("SPARK_GRAFT_SCALE_POINTS", "100000000").toLong

  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (a, b, c) = runAll(spark, cpus)
    println(s"""{"metric":"scaling_level","cpus":$cpus,"ingest_docs_per_sec":$a,"geocode_queries_per_sec":$b,"tile_points_per_sec":$c,"n_pages":$NPages,"n_queries":$NQueries,"n_points":$NPoints}""")
    spark.stop()
  }

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  /** Returns (ingest docs/sec, geocode queries/sec, tile points/sec). */
  def runAll(spark: SparkSession, cpus: Int): (Double, Double, Double) = {
    import graft.index.PageSynth

    // A. page ingest + extraction (range source splits at session
    // parallelism — no synthetic shuffle in the measured path)
    def ingest(n: Int): Long =
      PageSynth.extract(spark, PageSynth.pages(spark, n)).count()
    // warm with the SAME workload: codegen classes embed literals, so a
    // different-size warmup compiles a different class and the measured run
    // would pay interpreted-mode cost (measured 135s vs 5.9s warm)
    ingest(NPages)
    val tA = time(ingest(NPages))
    System.err.println(s"[scaling cpus=$cpus] ingest ${NPages} pages: ${tA}s")

    // B. batch forward geocode against the built index
    val index = PageSynth.buildIndex(spark, 1000)
    index.layers.foreach { l => l.postings.count(); l.tileFeatures.count() }
    val names = PageSynth.gazetteer.map(_.name.split(",")(0))
    def geocode(n: Int): Long = {
      val qs = spark.range(n).select(col("id").as("query_id"),
        element_at(array(names.map(lit): _*),
          (pmod(col("id"), lit(names.length)) + 1).cast("int")).as("query"))
      graft.query.Forward.forward(spark, index, qs).count()
    }
    geocode(NQueries)
    val tB = time(geocode(NQueries))
    System.err.println(s"[scaling cpus=$cpus] geocode ${NQueries}: ${tB}s")

    // C. bulk tile assignment: map-only mercator math, aggregated without
    // grouping so the measurement is the codegen scan itself
    def tiles(n: Long): Long = {
      val pts = spark.range(n).select(
        ((col("id") % 3600000L) / 10000.0 - 180.0 + 0.00005).as("lon"),
        ((col("id") % 1400000L) / 10000.0 - 70.0 + 0.00005).as("lat"))
      // head() (not count()) — count over an aggregate lets the optimizer
      // prune the tile-math column and measure an empty scan
      pts.select((graft.ops.GeoOps.tileX(col("lon"), 14) +
          graft.ops.GeoOps.tileY(col("lat"), 14)).as("t"))
        .agg(sum(col("t"))).head().getLong(0)
    }
    tiles(NPoints)
    val tC = time(tiles(NPoints))
    System.err.println(s"[scaling cpus=$cpus] tiles ${NPoints}: ${tC}s")

    (NPages / tA, NQueries / tB, NPoints / tC)
  }
}
