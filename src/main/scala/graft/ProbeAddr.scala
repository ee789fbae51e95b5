package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution for the address-resolution workload (`geocode_address`
  * bench entry): 1k house-number queries against the BigGazetteer address
  * layer, warm pass timed, then a stats pass for per-stage split.
  */
object ProbeAddr {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0) else "32"
    val nq = if (args.length > 1) args(1).toInt else 1000
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val index = graft.index.BigGazetteer.buildIndex(spark, 22000)
    index.layers.foreach { l =>
      l.postings.count(); l.tileFeatures.count(); l.features.count()
    }
    index.candByQsig.values.foreach { case (d, p, pd) =>
      d.count(); p.count(); pd.count()
    }
    index.allPostingsQsig.count()
    index.allFeaturesWide.count()
    index.allTileFeatures.count()
    println(f"PROBE build_index ${(System.nanoTime() - t0) / 1e9}%.1fs")

    val qs = graft.index.BigGazetteer.addressQueries(spark, nq, 22000)
      .localCheckpoint()

    def run(tag: String, stats: Option[query.Forward.GeocodeStats]): Unit = {
      val t = System.nanoTime()
      val n = query.Forward.forward(spark, index, qs, stats = stats).count()
      println(f"PROBE $tag ${(System.nanoTime() - t) / 1e9}%.1fs rows=$n")
      stats.foreach(s => println(s"PROBE stages: $s"))
    }
    run("warmup", None)
    run("warm", None)
    run("stats_pass", Some(new query.Forward.GeocodeStats()))
    spark.stop()
  }
}
